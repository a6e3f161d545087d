from . import aggregates, dedup, similarity, topk, windows  # noqa: F401
