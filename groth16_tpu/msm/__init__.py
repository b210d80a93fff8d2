from groth16_tpu.msm.pippenger import msm_device  # noqa: F401
from groth16_tpu.msm.fixed_base import batch_mul_device, build_window_table  # noqa: F401
