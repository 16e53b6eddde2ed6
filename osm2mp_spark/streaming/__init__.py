from .checkpoint import checkpointed_write, read_manifest, resume_remaining  # noqa: F401
