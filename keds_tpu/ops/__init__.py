from keds_tpu.ops.topk import mips_topk, mips_topk_sharded  # noqa: F401
