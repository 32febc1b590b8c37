"""Property tests: codec roundtrips on arbitrary arrays (hypothesis) and
the nearest as-of join checked differentially against pandas
``merge_asof(direction='nearest')`` on random event streams."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from historic_score_etl_pipeline_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 23),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    level=st.sampled_from([1, 6, 9]),
)
def test_png_roundtrip_property(h, w, c, seed, level):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )
    back = decode_png(encode_png(img, level=level))
    assert back.shape == img.shape
    assert np.array_equal(back, img)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 700),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    samples = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=(n, ch))
        .astype(np.int16)
    )
    back, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert back.shape == (n, ch)
    assert np.array_equal(back, samples)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_nearest_matches_pandas_merge_asof(spark, seed):
    """Differential: on random (key, ts) streams with distinct
    timestamps (pandas' tie convention differs, our own tie tests pin
    ours), asof_nearest_join must agree with pandas merge_asof
    direction='nearest' row for row."""
    from historic_score_etl_pipeline_spark.operators.joins import (
        asof_nearest_join,
    )

    rng = np.random.default_rng(seed)
    n_left, n_right = 120, 80
    # distinct integer second offsets → no cross-side ties
    all_ts = rng.choice(np.arange(1, 100_000), size=n_left + n_right, replace=False)
    lts, rts = all_ts[:n_left], all_ts[n_left:]
    lkey = rng.integers(0, 6, n_left)
    rkey = rng.integers(0, 6, n_right)
    lpdf = pd.DataFrame(
        {"lid": np.arange(n_left), "key": lkey, "lts": pd.to_datetime(lts, unit="s")}
    )
    rpdf = pd.DataFrame(
        {"rid": np.arange(n_right), "key": rkey, "rts": pd.to_datetime(rts, unit="s")}
    )
    expected = pd.merge_asof(
        lpdf.sort_values("lts"),
        rpdf.sort_values("rts").rename(columns={"rts": "rts_r"}),
        left_on="lts",
        right_on="rts_r",
        by="key",
        direction="nearest",
    ).set_index("lid")["rid"]

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = {
        r["lid"]: r["rid"]
        for r in asof_nearest_join(
            left, right, "key", "lts", "rts", ["rid"], right_tiebreak="rid"
        ).collect()
    }
    for lid, exp_rid in expected.items():
        exp = None if pd.isna(exp_rid) else int(exp_rid)
        assert got[lid] == exp, (lid, got[lid], exp)
