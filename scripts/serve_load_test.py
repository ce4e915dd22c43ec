#!/usr/bin/env python
"""8-client serving load test (VERDICT r3 next-round #5 "done" criterion).

Spins the HTTP server in-process around a checkpoint (a training run dir,
or a synthetic tiny one with --synthetic), then drives it with 1 client
looping /render_video (the starvation generator) + N-1 clients looping
/render, and reports a latency table: p50/p95/max per client class, video
wall time, and the no-starvation verdict (every /render beat the video's
wall-clock — under round 3's global lock they queued BEHIND it).

    python scripts/serve_load_test.py --synthetic            # CPU smoke
    python scripts/serve_load_test.py --run logs/ref_lego    # real chip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POSE = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]]


def _post(url, payload, timeout=900):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=None, help="training run dir")
    ap.add_argument("--synthetic", action="store_true",
                    help="tiny CPU checkpoint instead of --run")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--duration", type=float, default=30.0,
                    help="seconds of sustained load")
    ap.add_argument("--video_poses", type=int, default=24)
    ap.add_argument("--factor", type=int, default=0,
                    help="downscale for /render requests")
    ap.add_argument("--batch_max", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.synthetic:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cvnerf_tpu.serve import NerfRenderer
    from cvnerf_tpu.server import make_server

    if args.synthetic:
        import tempfile

        from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
        from cvnerf_tpu.render.renderer import RenderConfig
        from cvnerf_tpu.train.checkpoint import save_checkpoint
        from cvnerf_tpu.train.state import TrainState, create_train_state
        tiny = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32,
                             head_width=16)
        d = os.path.join(tempfile.mkdtemp(prefix="load_test_"), "ckpt")
        st = create_train_state(jax.random.PRNGKey(0), mlp=tiny)
        save_checkpoint(d, TrainState(params=st.params,
                                      opt_state=st.opt_state, step=1))
        r = NerfRenderer(d, height=32, width=32, focal=32.0, near=2.0,
                         far=6.0, cfg=RenderConfig(n_coarse=8, n_fine=8,
                                                   mlp=tiny),
                         chunk=1024, use_mesh=False)
    else:
        if not args.run:
            sys.exit("pass --run <dir> or --synthetic")
        r = NerfRenderer.from_run_dir(args.run)

    srv = make_server(r, "127.0.0.1", 0, batch_max=args.batch_max)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"server up at {url}; warming compiled programs...")
    _post(url + "/render", {"c2w": POSE, "factor": args.factor}).read()
    try:
        _post(url + "/render_video", {"poses": [POSE, POSE], "fps": 5}).read()
    except urllib.error.HTTPError as e:
        if e.code != 501:       # 501 = no mp4 encoder; frames still render
            raise

    stop = time.time() + args.duration
    render_lat, video_lat, errors = [], [], []
    lock = threading.Lock()

    def render_client():
        while time.time() < stop:
            t0 = time.time()
            try:
                _post(url + "/render",
                      {"c2w": POSE, "factor": args.factor}).read()
                with lock:
                    render_lat.append(time.time() - t0)
            except urllib.error.HTTPError as e:
                with lock:
                    errors.append(e.code)
                time.sleep(0.2)

    def video_client():
        while time.time() < stop:
            t0 = time.time()
            try:
                _post(url + "/render_video",
                      {"poses": [POSE] * args.video_poses, "fps": 5}).read()
                with lock:
                    video_lat.append(time.time() - t0)
            except urllib.error.HTTPError as e:
                if e.code == 501:
                    with lock:      # no encoder: frames still rendered
                        video_lat.append(time.time() - t0)
                else:
                    with lock:
                        errors.append(e.code)
                    time.sleep(0.2)

    threads = [threading.Thread(target=video_client)]
    threads += [threading.Thread(target=render_client)
                for _ in range(args.clients - 1)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t0

    def table(xs):
        if not xs:
            return {}
        xs = sorted(xs)
        return {"n": len(xs),
                "p50_ms": round(1e3 * xs[len(xs) // 2], 1),
                "p95_ms": round(1e3 * xs[int(len(xs) * 0.95)], 1),
                "max_ms": round(1e3 * xs[-1], 1)}

    result = {
        "clients": args.clients, "duration_s": round(elapsed, 1),
        "video_poses": args.video_poses, "batch_max": args.batch_max,
        "render": table(render_lat), "video": table(video_lat),
        "render_rps": round(len(render_lat) / elapsed, 2),
        "errors": {str(c): errors.count(c) for c in set(errors)},
        # No starvation: p95 of interleaved /render latency beats the
        # median whole-video pass. Under round 3's global lock every
        # /render issued during a video waited for the ENTIRE sequence,
        # so its p50 (not just p95) would sit ABOVE the video time.
        "no_starvation": bool(
            render_lat and video_lat and
            sorted(render_lat)[int(len(render_lat) * 0.95)]
            < sorted(video_lat)[len(video_lat) // 2]),
    }
    srv.shutdown()
    srv.server_close()
    print(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
