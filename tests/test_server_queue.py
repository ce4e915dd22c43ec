"""Serving concurrency (round 4): the bounded FIFO device queue that
replaced the global render lock — fairness under a long /render_video,
micro-batching equivalence, 503 backpressure, health queue stats."""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.serve import NerfRenderer
from cvnerf_tpu.server import (DeviceQueue, QueueFullError, make_server)
from cvnerf_tpu.train.checkpoint import save_checkpoint
from cvnerf_tpu.train.state import TrainState, create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)
POSE = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]]


def _renderer(tmp_path):
    d = str(tmp_path / "ckpt")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    save_checkpoint(d, TrainState(params=params, opt_state=state.opt_state,
                                  step=1))
    return NerfRenderer(d, height=12, width=16, focal=14.0, near=2.0,
                        far=6.0,
                        cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
                        chunk=256, use_mesh=False)


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_microbatch_matches_sequential(tmp_path):
    """A batched pop (render_poses_extras) returns exactly what separate
    single-frame renders return (deterministic serving)."""
    r = _renderer(tmp_path)
    q = DeviceQueue(r, maxsize=16, batch_max=8)
    seq = r.render_pose_extras(np.asarray(POSE, np.float32), keys=("rgb",))

    # Submit 4 identical jobs back-to-back so the worker pops them as one
    # batch (it may pop the first alone if it wakes early — both paths
    # must give identical pixels, which is the real contract).
    jobs = [q.submit_async(POSE, 0, ("rgb",)) for _ in range(4)]
    outs = [q.wait(j, timeout=120) for j in jobs]
    for o in outs:
        np.testing.assert_array_equal(o["rgb"], seq["rgb"])


def test_queue_full_raises_and_errors_propagate(tmp_path):
    r = _renderer(tmp_path)
    # Block the worker with a slow render so the queue actually fills.
    gate = threading.Event()
    real = r.render_pose_extras

    def slow(*a, **k):
        gate.wait(30)
        return real(*a, **k)

    r.render_pose_extras = slow
    r.render_poses_extras = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("batch path unexpected here"))
    q = DeviceQueue(r, maxsize=2, batch_max=1)
    j1 = q.submit_async(POSE, 0, ("rgb",))   # worker picks this up
    time.sleep(0.2)                          # let the worker dequeue j1
    j2 = q.submit_async(POSE, 0, ("rgb",))
    j3 = q.submit_async(POSE, 0, ("rgb",))
    with pytest.raises(QueueFullError):
        q.submit_async(POSE, 0, ("rgb",))
    gate.set()
    for j in (j1, j2, j3):
        assert q.wait(j, timeout=60)["rgb"].shape == (12, 16, 3)

    # Render errors reach the waiter as the original exception.
    r.render_pose_extras = lambda *a, **k: (_ for _ in ()).throw(
        ValueError("boom"))
    bad = q.submit_async(POSE, 0, ("rgb",))
    with pytest.raises(ValueError, match="boom"):
        q.wait(bad, timeout=60)


def test_abandoned_jobs_are_skipped(tmp_path):
    r = _renderer(tmp_path)
    calls = []
    real = r.render_pose_extras
    gate = threading.Event()

    def counting(c2w, **k):
        gate.wait(30)
        calls.append(1)
        return real(c2w, **k)

    r.render_pose_extras = counting
    q = DeviceQueue(r, maxsize=8, batch_max=1)
    j1 = q.submit_async(POSE, 0, ("rgb",))   # worker blocks on this one
    time.sleep(0.2)
    j2 = q.submit_async(POSE, 0, ("rgb",))
    j2["abandoned"] = True                   # client hung up
    j3 = q.submit_async(POSE, 0, ("rgb",))
    gate.set()
    q.wait(j1, timeout=60)
    q.wait(j3, timeout=60)
    assert len(calls) == 2                   # j2 never rendered


def test_render_interleaves_with_video(tmp_path):
    """The starvation regression: under the old global lock a /render
    issued during a long /render_video waited for the WHOLE sequence.
    With the frame-granular queue it must complete long before the video
    does."""
    r = _renderer(tmp_path)
    srv = make_server(r, "127.0.0.1", 0, queue_size=64, batch_max=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # warm up the compiled programs (single-frame and batch-of-2);
        # 501 = no mp4 encoder on this host — frames still rendered,
        # which is all the warm-up needs (same tolerance as the video
        # client below and scripts/serve_load_test.py)
        _post(url + "/render", {"c2w": POSE}).read()
        try:
            _post(url + "/render_video",
                  {"poses": [POSE, POSE], "fps": 5})
        except urllib.error.HTTPError as e:
            if e.code != 501:
                raise

        n_video = 24
        video_done = {}

        def video_client():
            t0 = time.time()
            try:
                _post(url + "/render_video",
                      {"poses": [POSE] * n_video, "fps": 5},
                      timeout=600).read()
                video_done["t"] = time.time() - t0
            except urllib.error.HTTPError as e:  # 501: no mp4 encoder
                video_done["t"] = time.time() - t0
                video_done["code"] = e.code

        vt = threading.Thread(target=video_client)
        vt.start()
        time.sleep(0.3)   # let the video occupy the queue
        lat = []
        for _ in range(4):
            t0 = time.time()
            _post(url + "/render", {"c2w": POSE}, timeout=300).read()
            lat.append(time.time() - t0)
        vt.join(600)
        assert "t" in video_done, "video request never finished"
        # Each interleaved /render must beat the whole-video wall time —
        # the old lock serialized it AFTER the video.
        assert max(lat) < video_done["t"], (lat, video_done)

        with urllib.request.urlopen(url + "/health", timeout=30) as resp:
            health = json.loads(resp.read())
        assert "queue_depth" in health and health["queue_size"] == 64
    finally:
        srv.shutdown()
        srv.server_close()


def test_blocked_submit_honors_absolute_deadline(tmp_path):
    """submit_async(block=True, timeout=T) must give up ~T after the CALL,
    not T after the last wakeup — under contention every freed slot wakes
    all blocked senders and a re-armed relative wait never expires."""
    from cvnerf_tpu.server import RenderTimeoutError
    r = _renderer(tmp_path)
    gate = threading.Event()
    real = r.render_pose_extras
    r.render_pose_extras = lambda *a, **k: (gate.wait(30), real(*a, **k))[1]
    q = DeviceQueue(r, maxsize=1, batch_max=1)
    try:
        q.submit_async(POSE, 0, ("rgb",))      # worker blocks on this
        time.sleep(0.2)
        q.submit_async(POSE, 0, ("rgb",))      # fills the queue
        # Churn the condition variable from another thread so the blocked
        # sender keeps waking: the deadline must still hold.
        stop = threading.Event()

        def churn():
            while not stop.is_set():
                with q._cv:
                    q._cv.notify_all()
                time.sleep(0.05)

        t = threading.Thread(target=churn, daemon=True)
        t.start()
        t0 = time.time()
        with pytest.raises(RenderTimeoutError):
            q.submit_async(POSE, 0, ("rgb",), block=True, timeout=0.6)
        elapsed = time.time() - t0
        stop.set()
        assert elapsed < 5.0, f"deadline not honored: {elapsed:.1f}s"
    finally:
        gate.set()
        q.close()


def test_queue_close_unblocks_and_stops_worker(tmp_path):
    """close() fails queued jobs (no waiter hangs), rejects new submits,
    and joins the worker thread — servers built repeatedly must not leak
    threads pinning renderers."""
    from cvnerf_tpu.server import RenderTimeoutError
    r = _renderer(tmp_path)
    gate = threading.Event()
    real = r.render_pose_extras
    r.render_pose_extras = lambda *a, **k: (gate.wait(30), real(*a, **k))[1]
    q = DeviceQueue(r, maxsize=4, batch_max=1)
    q.submit_async(POSE, 0, ("rgb",))          # worker blocks on this
    time.sleep(0.2)
    j2 = q.submit_async(POSE, 0, ("rgb",))     # still queued
    q.close(join_timeout=0.1)                  # worker busy: don't wait
    with pytest.raises(RenderTimeoutError, match="closed"):
        q.wait(j2, timeout=5)
    with pytest.raises(RenderTimeoutError, match="closed"):
        q.submit_async(POSE, 0, ("rgb",))
    gate.set()                                 # release the worker
    q._worker_thread.join(10)
    assert not q._worker_thread.is_alive()
