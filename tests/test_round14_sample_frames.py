"""Pins the r14 batch-vectorized sample_frames kernel to the original
per-chunk Python reference (fake frame model: nf = n % 30 + 1 contiguous
chunks, every k-th chunk's length and byte-sum checksum)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_pinot_spark.operators import multimodal as mm


class _FakeDF:
    def mapInPandas(self, run, schema):
        return run


def _reference(pdf: pd.DataFrame, every_k: int) -> pd.DataFrame:
    out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_checksum": []}
    for doc_id, payload in zip(pdf["doc_id"].values, pdf["payload"]):
        n = len(payload)
        nf = n % 30 + 1
        for i in range(0, nf, every_k):
            lo, hi = i * n // nf, (i + 1) * n // nf
            out["doc_id"].append(doc_id)
            out["frame_idx"].append(i)
            out["frame_len"].append(hi - lo)
            out["frame_checksum"].append(sum(payload[lo:hi]) % (1 << 31))
    return pd.DataFrame(out)


@pytest.mark.parametrize("every_k", [1, 3, 50])
@pytest.mark.parametrize("max_len,n_docs", [(50, 200), (5000, 400), (120_000, 40)])
def test_sample_frames_matches_reference(every_k, max_len, n_docs):
    rng = np.random.default_rng(7)
    payloads = [
        bytes(rng.integers(0, 256, size=int(s), dtype=np.uint8))
        for s in rng.integers(0, max_len, size=n_docs)
    ] + [b""]  # empty payload: one empty frame, checksum 0
    pdf = pd.DataFrame(
        {"doc_id": np.arange(n_docs + 1, dtype=np.int64), "payload": payloads}
    )
    run = mm.sample_frames(_FakeDF(), every_k=every_k)
    got = pd.concat(list(run(iter([pdf])))).reset_index(drop=True)
    ref = _reference(pdf, every_k)
    assert ref.equals(got.astype(ref.dtypes.to_dict()))
