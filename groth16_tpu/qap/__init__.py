from groth16_tpu.qap.reduction import LibsnarkReduction
