"""Batch-prover checkpoint/resume (SURVEY §5.3/§5.4 analog)."""

from groth16_tpu.curves.params import get_curve

CURVE = "bn254"

def test_prove_batch_resumable(tmp_path):
    """Checkpoint/resume batch proving (SURVEY §5.3/5.4 analog): killed
    runs resume from completed proofs; corrupt checkpoints re-prove."""
    from groth16_tpu.protocol import prepare_verifying_key, setup, verify_proof
    from groth16_tpu.protocol.prover_tpu import TpuProver
    from groth16_tpu.r1cs.circuits import MySillyCircuit
    from groth16_tpu.r1cs.system import ConstraintSystem, SynthesisMode
    from groth16_tpu.utils.resume import prove_batch_resumable
    from groth16_tpu.utils.rng import Rng

    c = get_curve(CURVE)
    rng = Rng(0xC4)
    pk, vk = setup(MySillyCircuit(), CURVE, rng)
    cases = [(3, 5), (7, 11)]
    zs, pubs = [], []
    for a, b in cases:
        cs = ConstraintSystem(c.r, mode=SynthesisMode.PROVE)
        MySillyCircuit(a=a, b=b)(cs)
        zs.append(cs.full_assignment())
        pubs.append([a * b % c.r])
    prover = TpuProver(pk, cs.to_matrices())
    rs = [rng.field_element(c.r) for _ in cases]
    ss = [rng.field_element(c.r) for _ in cases]
    ckpt = str(tmp_path / "ckpt")
    proofs = prove_batch_resumable(prover, vk, zs, pubs, rs, ss, ckpt)
    pvk = prepare_verifying_key(vk)
    for proof, pub in zip(proofs, pubs):
        assert verify_proof(pvk, proof, pub)
    # resume: all proofs come from checkpoints (prover not consulted)
    class Boom:
        def prove(self, *a):
            raise AssertionError("should have resumed from checkpoints")
    again = prove_batch_resumable(Boom(), vk, zs, pubs, rs, ss, ckpt)
    assert again == proofs
    # corrupt one checkpoint: must re-prove just that one
    import os
    with open(os.path.join(ckpt, "proof_000000.bin"), "wb") as f:
        f.write(b"garbage")
    fixed = prove_batch_resumable(prover, vk, zs, pubs, rs, ss, ckpt)
    assert fixed == proofs
