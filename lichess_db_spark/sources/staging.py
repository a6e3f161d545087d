"""Staging: lichess .pgn.zst month dumps -> splittable text chunks
(SURVEY.md §2.1 S1, §7 phase 4).

A month file is a single non-splittable zstd stream (the reference
decompresses it inline while parsing, ingester.py:89-110). For Spark,
parallelism comes from (a) months — one staging task per month, run
in a thread pool like the reference's serial loop but concurrent —
and (b) chunking each decompressed stream into ~chunk_bytes text
files, cut ONLY at game boundaries (the blank line after a moves
line) so no game straddles files and the parser can treat each file
independently.

Network/zstd deps are optional (absent in the test container); the
chunker itself is pure Python and unit-tested against local text.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterable, Iterator

try:  # optional: only needed for live downloads
    import requests  # type: ignore
except Exception:  # pragma: no cover
    requests = None

try:  # optional: only needed for live downloads
    import zstandard as zstd  # type: ignore
except Exception:  # pragma: no cover
    zstd = None

LICHESS_URL = (
    "https://database.lichess.org/standard/"
    "lichess_db_standard_rated_{year}-{month:02d}.pgn.zst"
)
# reference constants (ingester.py:96,102,130)
ZSTD_MAX_WINDOW = 2**31
HTTP_TIMEOUT = 360
EXPANSION_ESTIMATE = 5.2


def open_month_stream(year: int, month: int) -> io.TextIOWrapper:
    """HTTP + zstd streaming reader for one month (S1 twin)."""
    if requests is None or zstd is None:  # pragma: no cover
        raise NotImplementedError(
            "requests/zstandard not available in this environment; "
            "stage from local files with chunk_pgn_lines instead"
        )
    resp = requests.get(
        LICHESS_URL.format(year=year, month=month), stream=True, timeout=HTTP_TIMEOUT
    )
    resp.raise_for_status()
    dctx = zstd.ZstdDecompressor(max_window_size=ZSTD_MAX_WINDOW)
    return io.TextIOWrapper(dctx.stream_reader(resp.raw), encoding="utf-8")


def chunk_pgn_lines(
    lines: Iterable[str], out_dir: str, prefix: str, chunk_bytes: int = 128 * 1024 * 1024
) -> Iterator[str]:
    """Split a PGN line stream into files cut at game boundaries.

    A chunk closes at the first moves line (non-header payload) after
    the size budget — never mid-game, so downstream file-parallel
    parsing is safe. Yields the written paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    idx, written = 0, 0
    path = os.path.join(out_dir, f"{prefix}_{idx:05d}.pgn")
    fh = open(path, "w", encoding="utf-8")
    try:
        for line in lines:
            fh.write(line if line.endswith("\n") else line + "\n")
            written += len(line) + 1
            is_moves = bool(line.strip()) and not line.startswith("[")
            if is_moves and written >= chunk_bytes:
                fh.close()
                yield path
                idx += 1
                written = 0
                path = os.path.join(out_dir, f"{prefix}_{idx:05d}.pgn")
                fh = open(path, "w", encoding="utf-8")
    finally:
        fh.close()
    if written:
        yield path
    else:
        os.remove(path)


def stage_month(
    year: int, month: int, out_dir: str, chunk_bytes: int = 128 * 1024 * 1024
) -> list[str]:
    """Download+decompress+chunk one month. Idempotent: skips if the
    month's chunk dir already has files (fixes the reference's broken
    skip-check, ingest_lichess.py:23-27 / SURVEY §2.1 S9)."""
    month_dir = os.path.join(out_dir, f"year={year}", f"month={month:02d}")
    if os.path.isdir(month_dir) and any(f.endswith(".pgn") for f in os.listdir(month_dir)):
        return sorted(
            os.path.join(month_dir, f) for f in os.listdir(month_dir) if f.endswith(".pgn")
        )
    stream = open_month_stream(year, month)
    return list(
        chunk_pgn_lines(stream, month_dir, f"{year}_{month:02d}", chunk_bytes)
    )
