"""Leveled logging (err.h parity) and timers/counters (profile.h parity)."""

import io

from cmusphinx_tpu.utils.log import (E_DEBUG, E_ERROR, E_INFO, E_WARN,
                                     E_FATAL, FatalError, err_set_debug_level,
                                     err_set_logfp, err_set_loglevel)
from cmusphinx_tpu.utils.profile import Profile, Timer


def test_log_levels_and_format():
    buf = io.StringIO()
    err_set_logfp(buf)
    try:
        E_INFO("hello %d", 42)
        E_WARN("warn")
        E_ERROR("err")
        out = buf.getvalue()
        assert 'INFO: "test_observability.py", line' in out
        assert "hello 42" in out and "WARN:" in out and "ERROR:" in out
        # Debug suppressed by default, enabled by level.
        buf.truncate(0); buf.seek(0)
        E_DEBUG(2, "quiet")
        assert buf.getvalue() == ""
        err_set_debug_level(2)
        E_DEBUG(2, "loud")
        assert "loud" in buf.getvalue()
        err_set_debug_level(0)
        # Level filtering.
        buf.truncate(0); buf.seek(0)
        err_set_loglevel("error")
        E_INFO("nope"); E_WARN("nope")
        assert buf.getvalue() == ""
        err_set_loglevel("info")
        # E_FATAL raises.
        try:
            E_FATAL("boom %s", "x")
            assert False
        except FatalError as e:
            assert "boom x" in str(e)
    finally:
        err_set_logfp(None)
        err_set_loglevel("info")


def test_profile_timers_counters():
    p = Profile()
    t = p.timer("decode")
    with t:
        x = sum(range(10000))
    assert t.t_elapsed > 0
    before = t.t_elapsed
    t.start(); t.stop()
    assert t.t_elapsed >= before  # accumulates across intervals
    p.counter("senones").increment(100)
    p.counter("senones").increment(50)
    rep = p.report(audio_seconds=1.0)
    assert "decode:" in rep and "xRT" in rep and "senones=150" in rep
    p.reset()
    assert p.counter("senones").count == 0 and p.timer("decode").t_elapsed == 0


def test_timer_sync_accepts_non_jax():
    t = Timer("x").start()
    t.stop(sync=object())  # no block_until_ready -> ignored
    assert t.t_elapsed >= 0
