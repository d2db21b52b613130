from emdr2_tpu.ops.mips import exact_topk, mips_topk, sharded_mips_topk  # noqa: F401
