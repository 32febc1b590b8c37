"""Adversarial-fixture parity regression (round 8, new axis).

``run_parity.py --adversarial`` runs the FULL 527-key registry against a
perturbed sf0.001 copy (testing_adversarial.py) once per round; this
test locks in the 56 keys that DIVERGED on the axis's first contact —
the fixture-assumption classes (NULL/empty/newline text, NULL numerics,
zero vectors, duplicates, ties, malformed JSON) that the clean
sf0.01/sf0.1/hostile gates can never see.  Full tier: the fixture build
is ~1 s, the 56 keys ~4 min.
"""

from __future__ import annotations

import pytest

from historic_score_etl_pipeline_spark import contract
from historic_score_etl_pipeline_spark.testing import (
    compare,
    duckdb_connection,
    scalar_only_violation,
)
from historic_score_etl_pipeline_spark.testing_adversarial import (
    build_adversarial_fixture,
)

# the round-8 first-contact divergence set (BASELINE.md §r8-adversarial)
FIRST_CONTACT_FAILURES = sorted(
    [
        "agg_skew_kurt", "agg_time_rollup", "anomaly_mad_robust",
        "anomaly_zscore_rolling", "array_explode_outer_null",
        "dedup_embed_exact", "dedup_exact", "dedup_simhash",
        "dedup_simhash_hamming", "embed_metric_rank_correlation",
        "embed_pq_adc_topk", "embed_pq_encode", "embed_quantize_int8",
        "hof_map_pipeline", "json_corrupt_tolerant", "json_parse_extract",
        "json_props_numeric_stats", "json_variant",
        "multimodal_audio_downsample_2x", "multimodal_audio_frame_rms",
        "multimodal_audio_loudest_window", "multimodal_audio_peak_count",
        "multimodal_audio_silence_trim", "multimodal_audio_zero_crossings",
        "multimodal_frames", "multimodal_image_ahash",
        "multimodal_image_border_contrast", "multimodal_image_edge_energy",
        "multimodal_image_hist_equalization",
        "multimodal_image_projection_peak", "multimodal_image_symmetry_score",
        "multimodal_image_tile_means", "multimodal_pixel_histogram",
        "multimodal_video_scene_cuts", "sample_time_group_split_audit",
        "sample_weighted_hash", "scan_text_wholefile", "scan_textfile",
        "scan_tsv_gzip", "sql_pivot", "sql_pivot_dynamic", "str_first_token",
        "str_initcap_title", "str_phonetic_key", "text_collocation_llr",
        "text_length_outliers_iqr", "udtf_explode_matches",
        "udtf_overlap_chunks", "window_cume_dist", "window_exp_decay_sum",
        "window_minmax_scale", "window_peak_local_max", "window_range_7d",
        "window_rolling_median", "window_rolling_minmax",
        "window_winsorize_clip",
        # green on first contact but load-bearing for the fixed classes:
        "dedup_near_minhash", "dedup_minhash_jaccard_est",
        "dedup_ngram_jaccard", "text_containment_ngram",
    ]
)


def _rotating_slice(n: int = 40) -> list[str]:
    """A per-round deterministic sample of the REST of the registry
    (ADVICE r8): a contract change that breaks adversarial parity on a
    key outside FIRST_CONTACT_FAILURES now has a 40/(527−60) ≈ 9%
    chance per round of being caught by CI alone, on top of the manual
    full ``run_parity.py --adversarial`` sweep.  The round index is the
    count of driver CORRECTNESS files, so the slice rotates each round
    with no code change; within a round it is stable (md5 order)."""
    import glob
    import hashlib
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = len(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    pinned = set(FIRST_CONTACT_FAILURES)
    rest = [k for k in contract.queries() if k not in pinned]
    rest.sort(key=lambda k: hashlib.md5(f"adv{rnd}_{k}".encode()).hexdigest())
    return sorted(rest[:n])


ROTATING_SLICE = _rotating_slice()


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory, sf_smoke) -> str:
    return build_adversarial_fixture(
        sf_smoke,
        str(tmp_path_factory.mktemp("adversarial_sf")),
    )


@pytest.fixture(scope="module")
def adv_con(adversarial_dir):
    return duckdb_connection(adversarial_dir)


def _check_adversarial(name, spark, adversarial_dir, adv_con):
    qs, oracles = contract.queries(), contract.oracle_sql()
    sdf = qs[name](spark, adversarial_dir).toPandas()
    if name not in oracles:
        assert scalar_only_violation(sdf) is None
        return
    odf = adv_con.execute(oracles[name]).df()
    result = compare(name, sdf, odf)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", FIRST_CONTACT_FAILURES)
def test_adversarial_fixture_parity(name, spark, adversarial_dir, adv_con):
    _check_adversarial(name, spark, adversarial_dir, adv_con)


@pytest.mark.parametrize("name", ROTATING_SLICE)
def test_adversarial_rotating_slice(name, spark, adversarial_dir, adv_con):
    _check_adversarial(name, spark, adversarial_dir, adv_con)
