"""Python VideoStream seek semantics (runtime/stream.py).

Behavioral spec = the reference AviSynth filter's seek handling
(reference avisynth_plugin/src/main.cc:75-157): monotone serves,
small backward seeks from an LRU cache, larger seeks reset + re-warm
the recurrent state with lead-in frames.  The C-ABI twin of this
state machine (native/src/stream.cc) is covered by
native/tests/test_stream_capi.c; this covers the Python one.
"""

import numpy as np
import pytest

from joshupscale_tpu.models import create_models
from joshupscale_tpu.runtime.engine import Engine
from joshupscale_tpu.runtime.stream import VideoStream

H, W, N = 16, 24, 8


@pytest.fixture(scope="module")
def setup():
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": H,
            "frame_width": W,
        },
    }
    built = create_models(config, seed=3)["inference"]
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (N, H, W, 3)).astype(np.uint8)
    return built, frames


def _stream(built, frames, **kw):
    eng = Engine(built.obj, built.params)
    return VideoStream(eng, lambda i: frames[min(i, N - 1)],
                       num_frames=N, **kw)


def test_sequential_matches_engine(setup):
    """The stream OPENS in a warm-up window (reference m_NextFrame =
    -MAX_BACKTRACK_SIZE): frame 0 is served after max_backtrack
    mirrored lead-in frames, clamped to the stream length."""
    built, frames = setup
    back = 16
    vs = _stream(built, frames)
    eng = Engine(built.obj, built.params)
    for n in range(-back, 0):
        eng.process(frames[min(-n, N - 1)])  # mirrored warm-up
    for i in range(N):
        np.testing.assert_array_equal(
            vs.get_frame(i), eng.process(frames[i]))


def test_small_backseek_served_from_cache(setup):
    built, frames = setup
    vs = _stream(built, frames, max_backtrack=3)
    outs = [vs.get_frame(i) for i in range(5)]
    # Within max_backtrack: cached copies, bit-exact, and the engine
    # must NOT run (recurrent state would advance and corrupt later
    # frames).
    calls = []
    orig = vs.engine.process
    vs.engine.process = lambda f: calls.append(1) or orig(f)
    for i in (4, 3, 2):
        np.testing.assert_array_equal(vs.get_frame(i), outs[i])
    assert not calls, "cache hits must not touch the engine"
    vs.engine.process = orig
    # The stream continues correctly after cache hits.
    eng = Engine(built.obj, built.params)
    for i in (3, 2, 1):
        eng.process(frames[i])  # the stream's own mirrored warm-up
    for i in range(6):
        ref = eng.process(frames[i])
    np.testing.assert_array_equal(vs.get_frame(5), ref)


def test_large_backseek_resets_and_rewarms(setup):
    built, frames = setup
    back = 2
    vs = _stream(built, frames, max_backtrack=back)
    for i in range(6):
        vs.get_frame(i)
    out0 = vs.get_frame(0)  # 0 is far behind next=6 and evicted
    # Independent reproduction of the warm-up: reset engine, feed
    # `back` MIRRORED lead-in frames (reference main.cc:110), then 0.
    eng = Engine(built.obj, built.params)
    for i in range(back, 0, -1):
        eng.process(frames[i])
    np.testing.assert_array_equal(out0, eng.process(frames[0]))


def test_large_forward_jump_rewarms(setup):
    built, frames = setup
    back = 2
    vs = _stream(built, frames, max_backtrack=back)
    vs.get_frame(0)
    out6 = vs.get_frame(6)  # jump > max_backtrack: reset + warm from 4
    eng = Engine(built.obj, built.params)
    for i in range(6 - back, 6):
        eng.process(frames[i])
    np.testing.assert_array_equal(out6, eng.process(frames[6]))


def test_out_of_range_raises(setup):
    built, frames = setup
    vs = _stream(built, frames)
    with pytest.raises(IndexError):
        vs.get_frame(N)
    with pytest.raises(IndexError):
        vs.get_frame(-1)


def test_warmup_outputs_not_cached_after_reset(setup):
    """Outputs produced inside a post-reset warm-up window come from
    partially-warmed state and must NOT be cached (reference
    m_DontCache, main.cc:150-157): a later back-seek into that window
    re-warms instead of serving the degraded frame."""
    built, frames = setup
    back = 2
    vs = _stream(built, frames, max_backtrack=back)
    for i in range(8):
        vs.get_frame(i)
    vs.get_frame(1)  # out of cache: reset(1), warm-up covers n=-1,0
    # Frame 0 was just computed as a warm-up output; it must not have
    # been cached -- the stream must re-warm, touching the engine.
    calls = []
    orig = vs.engine.process
    vs.engine.process = lambda f: calls.append(1) or orig(f)
    out0 = vs.get_frame(0)
    vs.engine.process = orig
    assert calls, "warm-up output served from cache (reference "\
        "m_DontCache semantics violated)"
    eng = Engine(built.obj, built.params)
    for i in range(back, 0, -1):
        eng.process(frames[i])  # mirrored re-warm
    np.testing.assert_array_equal(out0, eng.process(frames[0]))
