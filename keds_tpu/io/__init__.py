from keds_tpu.io.pt import load_pt, save_pt  # noqa: F401
