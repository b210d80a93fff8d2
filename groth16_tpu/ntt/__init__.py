from groth16_tpu.ntt.ntt import NttDomain, powers
