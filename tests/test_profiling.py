"""The xplane trace reader (aonerf/utils/xplane.py) against a real
jax.profiler capture — the profiling aux subsystem (SURVEY.md §5.1)."""

import tempfile

import jax
import jax.numpy as jnp

from aonerf.utils.xplane import device_op_table, latest_trace, parse_xspace


def _capture():
    d = tempfile.mkdtemp(prefix="aonerf_xplane_test_")
    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    x = jnp.ones((64, 64))
    f(x).block_until_ready()
    jax.profiler.start_trace(d)
    f(x).block_until_ready()
    jax.profiler.stop_trace()
    return d


class TestXplaneReader:
    def test_parse_real_trace(self):
        d = _capture()
        path = latest_trace(d)
        assert path is not None
        planes = parse_xspace(path)
        named = {p.name: p for p in planes}
        assert any(p.op_time_ps for p in planes), "no events decoded"
        cpu = [p for name, p in named.items() if "CPU" in name or "TPU" in name]
        assert cpu, f"no device/host plane found in {list(named)}"
        # the traced jit call must appear with nonzero duration
        ops = {n for p in cpu for n in p.op_time_ps}
        assert any("PjitFunction" in n or "jit" in n for n in ops), ops
        for p in cpu:
            assert p.total_ps == sum(p.op_time_ps.values())
            for name, ps, cnt in p.top(5):
                assert ps >= 0 and cnt >= 1

    def test_table_and_missing_dir(self):
        d = _capture()
        table = device_op_table(d, top_k=3)
        assert "total device time" in table
        assert "(no xplane.pb" in device_op_table(tempfile.mkdtemp())
