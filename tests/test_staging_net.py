"""Live-network staging test, env-gated (same honest-gate pattern as
the protobuf TWS and PIL decode skips): the container has neither
network egress nor requests/zstandard, so this runs only where a user
sets SPARK_GRAFT_NET=1 on a connected machine. It streams the first
few games of a real monthly dump and asserts the chunker contract —
making S1's network branch exercisable rather than a design note
(reference: ingest_lichess.py download loop)."""

from __future__ import annotations

import itertools
import os

import pytest

from lichess_db_spark.sources import staging


requires_net = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_NET") != "1"
    or staging.requests is None
    or staging.zstd is None,
    reason="live-network staging needs SPARK_GRAFT_NET=1 + requests + zstandard",
)


@requires_net
def test_open_month_stream_yields_pgn(tmp_path):
    stream = staging.open_month_stream(2013, 1)  # smallest early month
    head = list(itertools.islice(stream, 200))
    assert any(line.startswith("[Event ") for line in head)
    assert any(line.startswith("[Site ") for line in head)
    # the chunker must accept the live stream exactly like local lines
    chunks = list(
        staging.chunk_pgn_lines(iter(head), str(tmp_path), "m", chunk_bytes=4096)
    )
    assert chunks and all(os.path.exists(c) for c in chunks)
