from . import aggregates, dedup, merge, similarity, topk, windows  # noqa: F401
