from groth16_tpu.fields.spec import FpSpec, make_spec
