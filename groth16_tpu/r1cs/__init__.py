from groth16_tpu.r1cs.system import (
    ConstraintSystem,
    LinearCombination,
    SynthesisError,
    SynthesisMode,
    Variable,
    ONE,
)
