from . import dedup, hashing, multimodal, similarity, text  # noqa: F401
