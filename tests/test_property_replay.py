"""Property-based correctness: hypothesis draws generator knobs (event
mix, duplication, skew, key-changes, null PKs, seed) and the engine's
final lake state must equal the independent Python oracle on every
drawn interleaving — the randomized extension of the F1-F14 fixtures
(SURVEY.md §5)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from tapdata_connectors_spark.sources.generator import (
    GeneratorConfig,
    generate_events,
    stage_events,
)
from tapdata_connectors_spark.streaming.driver import CdcPipeline
from tests.helpers import assert_state_equal, oracle_replay

CONFIGS = st.builds(
    GeneratorConfig,
    n_events=st.integers(50, 400),
    n_urls=st.integers(5, 80),
    epoch_size=st.sampled_from([50, 100, 200]),
    seed=st.integers(0, 2**31 - 1),
    p_hot=st.sampled_from([0.0, 0.3, 0.8]),
    p_update=st.floats(0.0, 0.6),
    p_delete=st.floats(0.0, 0.3),
    p_dup=st.sampled_from([0.0, 0.1, 0.3]),
    p_key_change=st.sampled_from([0.0, 0.1]),
    p_null_pk=st.sampled_from([0.0, 0.1]),
    html_words=st.sampled_from([5, 40]),
)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(cfg=CONFIGS, mode=st.sampled_from(["cow", "mor"]))
def test_replay_equals_oracle_on_random_logs(spark, tmp_path_factory, cfg, mode):
    tmp = tmp_path_factory.mktemp("prop")
    ev = generate_events(spark, cfg)
    stage_events(ev, f"{tmp}/staging")
    pipe = CdcPipeline(spark, f"{tmp}/pages", f"{tmp}/staging",
                       n_buckets=4, merge_mode=mode)
    pipe.replay_batch()
    assert_state_equal(pipe.table.read(), oracle_replay(ev.collect()))
