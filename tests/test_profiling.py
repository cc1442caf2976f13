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
