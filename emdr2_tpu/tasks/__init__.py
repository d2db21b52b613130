from emdr2_tpu.tasks.e2eqa import E2EQATask  # noqa: F401
