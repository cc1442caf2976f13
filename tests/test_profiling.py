"""Observability utilities."""
import time

from elegantrl_tpu.utils.profiling import (
    ThroughputMeter, mlp_flops, sol_report)


def test_throughput_meter():
    m = ThroughputMeter()
    m.add(env_steps=1000, sgd_updates=10)
    m.add(env_steps=500)
    time.sleep(0.01)
    r = m.report()
    assert r['env_steps_per_s'] > 0
    assert abs(r['env_steps_per_s'] / r['sgd_updates_per_s'] - 150) < 1e-6


def test_mlp_flops():
    assert mlp_flops((4, 8, 2), batch=10) == 2 * 10 * (4 * 8 + 8 * 2)
    assert mlp_flops((4, 8, 2), batch=10, with_backward=True) == \
        3 * 2 * 10 * (4 * 8 + 8 * 2)


def test_sol_report_classifies_bound():
    r = sol_report(flops=1e12, hbm_bytes=1e9, seconds=0.1, chip='v5e')
    assert r.bound in ('compute', 'bandwidth')
    assert 0 < r.compute_util < 1
    # heavy-bytes program must classify bandwidth-bound
    r2 = sol_report(flops=1e9, hbm_bytes=1e11, seconds=0.5, chip='v5e')
    assert r2.bound == 'bandwidth'
    assert 'SOL' in str(r2)


def test_compilation_cache_idempotent(tmp_path, monkeypatch):
    import jax

    from elegantrl_tpu.utils import compile_cache
    monkeypatch.setattr(compile_cache, '_configured', False)
    monkeypatch.setattr(compile_cache, '_active_dir', None)
    d = str(tmp_path / 'xla_cache')
    assert compile_cache.enable_compilation_cache(d) == d
    assert compile_cache.enable_compilation_cache(d) == d   # idempotent
    # a later call with a DIFFERENT dir re-points the cache (not ignored)
    d2 = str(tmp_path / 'xla_cache2')
    assert compile_cache.enable_compilation_cache(d2) == d2
    assert jax.config.jax_compilation_cache_dir == d2
    monkeypatch.setenv('ELEGANTRL_TPU_CACHE_DIR', '')
    assert compile_cache.enable_compilation_cache(None) is None  # disabled
    assert jax.config.jax_compilation_cache_dir is None


def test_parse_device_trace_busy_frac(tmp_path):
    """busy_frac must be computed inside the trace's own clock (module
    sum(dur)/span) and therefore <= 1 even when host wall estimates would
    disagree (the round-4 1.0028 regression)."""
    import gzip
    import json
    import os

    from elegantrl_tpu.utils.profiling import parse_device_trace

    d = tmp_path / 'plugins' / 'profile' / 'run1'
    os.makedirs(d)
    events = [
        {'ph': 'M', 'name': 'process_name', 'pid': 1,
         'args': {'name': '/device:TPU:0'}},
        {'ph': 'M', 'name': 'thread_name', 'pid': 1, 'tid': 10,
         'args': {'name': 'XLA Modules'}},
        {'ph': 'M', 'name': 'thread_name', 'pid': 1, 'tid': 20,
         'args': {'name': 'XLA Ops'}},
        # two serial module executions: busy 100+200us over span 400us
        {'ph': 'X', 'pid': 1, 'tid': 10, 'name': 'jit_run', 'ts': 1000.0,
         'dur': 100.0, 'args': {'device_duration_ps': int(100e6)}},
        {'ph': 'X', 'pid': 1, 'tid': 10, 'name': 'jit_run', 'ts': 1200.0,
         'dur': 200.0, 'args': {'device_duration_ps': int(200e6)}},
        # an op row inside the first module
        {'ph': 'X', 'pid': 1, 'tid': 20, 'name': 'fusion.1', 'ts': 1010.0,
         'dur': 50.0, 'args': {'device_duration_ps': int(50e6),
                               'raw_bytes_accessed': 1024,
                               'model_flops': 2048,
                               'hlo_category': 'fusion'}},
    ]
    with gzip.open(d / 'x.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': events}, f)
    agg = parse_device_trace(str(tmp_path))
    assert agg is not None
    assert abs(agg['busy_s'] - 300e-6) < 1e-12
    assert abs(agg['span_s'] - 400e-6) < 1e-12
    assert abs(agg['busy_frac'] - 0.75) < 1e-9
    assert agg['busy_frac'] <= 1.0
    assert agg['bytes'] == 1024 and agg['flops'] == 2048
