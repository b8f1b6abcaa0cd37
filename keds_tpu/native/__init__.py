from keds_tpu.native.build import load_native_bpe  # noqa: F401
