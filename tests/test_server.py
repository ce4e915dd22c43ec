"""Tests for the HTTP serving front end (live localhost server)."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from cvnerf_tpu.models.nerf_mlp import NerfMLPConfig
from cvnerf_tpu.render.renderer import RenderConfig
from cvnerf_tpu.serve import NerfRenderer
from cvnerf_tpu.server import make_server
from cvnerf_tpu.train.checkpoint import save_checkpoint
from cvnerf_tpu.train.state import TrainState, create_train_state

TINY = NerfMLPConfig(xyz_freqs=4, dir_freqs=2, trunk_width=32, head_width=16)


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("server") / "ckpt")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    save_checkpoint(d, TrainState(params=params, opt_state=state.opt_state,
                                  step=state.step + 7))
    r = NerfRenderer(d, height=12, width=16, focal=14.0, near=2.0, far=6.0,
                     cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
                     chunk=128, use_mesh=False)
    srv = make_server(r, "127.0.0.1", 0)  # 0 → ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=60)


POSE = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]]


def test_health(server_url):
    with urllib.request.urlopen(server_url + "/health", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["step"] == 7
    assert (body["height"], body["width"]) == (12, 16)
    assert body["deterministic"] is True


def test_render_png(server_url):
    with _post(server_url + "/render", {"c2w": POSE}) as resp:
        assert resp.headers["Content-Type"] == "image/png"
        data = resp.read()
    # PNG magic, or the P6 PPM fallback when cv2 is absent.
    assert data[:4] in (b"\x89PNG", b"P6\n1"), data[:8]


def test_render_json_deterministic(server_url):
    out = []
    for _ in range(2):
        with _post(server_url + "/render",
                   {"c2w": POSE, "format": "json"}) as resp:
            out.append(json.loads(resp.read()))
    assert out[0]["shape"] == [12, 16, 3]
    rgb = np.asarray(out[0]["rgb"], np.float32)
    assert np.isfinite(rgb).all() and rgb.std() > 1e-4
    # Deterministic serving: identical responses for identical poses.
    assert out[0] == out[1]


def test_render_factor(server_url):
    with _post(server_url + "/render",
               {"c2w": POSE, "factor": 2, "format": "json"}) as resp:
        assert json.loads(resp.read())["shape"] == [6, 8, 3]


def test_render_4x4_pose_accepted(server_url):
    pose4 = POSE + [[0, 0, 0, 1.0]]
    with _post(server_url + "/render",
               {"c2w": pose4, "format": "json"}) as resp:
        assert resp.status == 200


@pytest.mark.parametrize("payload,msg", [
    ({}, "c2w"),
    ({"c2w": [[1, 2], [3, 4]]}, "3,4"),
    ({"c2w": POSE, "format": "bmp"}, "png|json"),
])
def test_bad_requests_are_400(server_url, payload, msg):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server_url + "/render", payload)
    assert ei.value.code == 400
    assert msg in json.loads(ei.value.read())["error"].replace("'", "")


def test_unknown_path_is_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server_url + "/nope", timeout=30)
    assert ei.value.code == 404


def test_encode_image_ppm_fallback(monkeypatch):
    """Without cv2 the encoder degrades to PPM and says so in the content
    type (clients must never get PPM bytes labeled image/png)."""
    import builtins
    import cvnerf_tpu.server as srv

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    rgb8 = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    body, ctype = srv._encode_image(rgb8)
    assert ctype == "image/x-portable-pixmap"
    assert body.startswith(b"P6\n3 2\n255\n")
    assert body.endswith(rgb8.tobytes())


def test_encode_image_png_roundtrip():
    cv2 = pytest.importorskip("cv2")
    import cvnerf_tpu.server as srv
    rgb8 = (np.random.RandomState(0).rand(5, 4, 3) * 255).astype(np.uint8)
    body, ctype = srv._encode_image(rgb8)
    assert ctype == "image/png"
    decoded = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(decoded[..., ::-1], rgb8)


def test_render_json_with_depth(server_url):
    r = _post(server_url + "/render",
              {"c2w": POSE, "format": "json", "include_depth": True})
    body = json.loads(r.read())
    h, w = body["shape"][:2]
    depth = np.asarray(body["depth"])
    acc = np.asarray(body["acc"])
    assert depth.shape == (h, w) and acc.shape == (h, w)
    assert np.isfinite(depth).all() and (acc >= 0).all()


def test_include_depth_requires_json(server_url):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server_url + "/render",
              {"c2w": POSE, "format": "png", "include_depth": True})
    assert ei.value.code == 400


def test_include_depth_must_be_boolean(server_url):
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server_url + "/render",
              {"c2w": POSE, "format": "json", "include_depth": "false"})
    assert ei.value.code == 400
    assert "boolean" in json.loads(ei.value.read())["error"]


def test_factor_out_of_range_is_400(server_url):
    for bad in (-1, 999):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server_url + "/render",
                  {"c2w": POSE, "factor": bad, "format": "json"})
        assert ei.value.code == 400, bad
        assert "factor" in json.loads(ei.value.read())["error"]


def test_oversized_request_is_413(server_url):
    """The body size cap rejects before buffering (advisor r2: an
    unbounded Content-Length read can exhaust host memory)."""
    import http.client
    host, port = server_url.split("//")[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/render")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(2 << 20))  # 2 MiB claim
        conn.endheaders()
        resp = conn.getresponse()          # rejected before the body reads
        assert resp.status == 413
        assert "limit" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_negative_content_length_is_400(server_url):
    """A negative Content-Length must not reach rfile.read(-1) (which
    would block until the client closes and then buffer unboundedly)."""
    import http.client
    host, port = server_url.split("//")[1].split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/render")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "negative" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_render_failure_is_500_json(server_url):
    """An unexpected error inside the render call must yield a JSON 500,
    not a dropped connection (advisor r2: the exception escaped the
    handler thread)."""
    import urllib.parse
    import cvnerf_tpu.serve as serve_mod

    orig = serve_mod.NerfRenderer.render_pose_extras

    def boom(self, *a, **k):
        raise RuntimeError("injected render failure")

    serve_mod.NerfRenderer.render_pose_extras = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server_url + "/render", {"c2w": POSE, "format": "json"})
        assert ei.value.code == 500
        assert "injected render failure" in \
            json.loads(ei.value.read())["error"]
    finally:
        serve_mod.NerfRenderer.render_pose_extras = orig


def _make_run_dir(tmp_path, *, ndc=False):
    """A minimal training-run directory: scene.json + checkpoints/."""
    from cvnerf_tpu.serve import write_scene_snapshot
    run = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    import os
    save_checkpoint(os.path.join(run, "checkpoints"),
                    TrainState(params=params, opt_state=state.opt_state,
                               step=state.step + 3))
    write_scene_snapshot(run, height=12, width=16, focal=14.0, near=2.0,
                         far=6.0, ndc=ndc, ndc_variant="canonical",
                         white_bkg=True, n_coarse=4, n_fine=4, bf16=False,
                         mlp=TINY)
    return run


def test_from_run_dir_matches_explicit_geometry(tmp_path):
    """NerfRenderer.from_run_dir reproduces exactly what an explicitly
    configured renderer produces — the snapshot carries the full render
    configuration, not just a subset."""
    import os
    run = _make_run_dir(tmp_path)
    ra = NerfRenderer.from_run_dir(run, chunk=128, use_mesh=False)
    rb = NerfRenderer(os.path.join(run, "checkpoints"), height=12, width=16,
                      focal=14.0, near=2.0, far=6.0,
                      cfg=RenderConfig(n_coarse=4, n_fine=4, white_bkg=True,
                                       mlp=TINY),
                      chunk=128, use_mesh=False)
    assert (ra.height, ra.width, ra.focal) == (12, 16, 14.0)
    assert (ra.near, ra.far, ra.ndc) == (2.0, 6.0, False)
    assert ra.step == rb.step == 3
    a = ra.render_pose(np.asarray(POSE))
    b = rb.render_pose(np.asarray(POSE))
    np.testing.assert_array_equal(a, b)


def test_from_run_dir_not_a_run(tmp_path):
    with pytest.raises(FileNotFoundError, match="scene.json"):
        NerfRenderer.from_run_dir(str(tmp_path / "nope"))


def test_run_snapshot_poses_drive_int8_calibration(tmp_path):
    """A snapshot that stores camera poses (subsampled to <=64) must make
    pose-free enable_int8() calibrate on real rays through them — not on
    the bounding-cube fallback (whose under-coverage measurably costs dB;
    regression for the serve CLI once calibrating in the occupancy cube)."""
    import os
    import cvnerf_tpu.ops.quantize as quant_mod
    from cvnerf_tpu.ops.quantize import QuantizedNerfParams
    from cvnerf_tpu.serve import write_scene_snapshot

    run = str(tmp_path / "run")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    save_checkpoint(os.path.join(run, "checkpoints"), state)
    # 100 distinct poses: translation encodes the pose index.
    poses = np.tile(np.eye(4, dtype=np.float32)[None, :3, :4], (100, 1, 1))
    poses[:, 2, 3] = 4.0 + np.arange(100) / 100.0
    write_scene_snapshot(run, height=12, width=16, focal=14.0, near=2.0,
                         far=6.0, ndc=False, ndc_variant="canonical",
                         white_bkg=True, n_coarse=4, n_fine=4, bf16=False,
                         mlp=TINY, calib_poses=poses)

    r = NerfRenderer.from_run_dir(run, chunk=128, use_mesh=False)
    assert r.calib_poses is not None and r.calib_poses.shape == (64, 3, 4)
    assert r.calib_poses[0, 2, 3] == poses[0, 2, 3]       # endpoints kept
    assert r.calib_poses[-1, 2, 3] == poses[-1, 2, 3]

    seen = {}
    orig = quant_mod.ray_calibration_samples

    def spy(key, n, poses_arg, *a, **kw):
        seen["poses"] = np.asarray(poses_arg)
        return orig(key, n, poses_arg, *a, **kw)

    quant_mod.ray_calibration_samples = spy
    try:
        r.enable_int8(n_calib=512)
    finally:
        quant_mod.ray_calibration_samples = orig
    np.testing.assert_array_equal(seen["poses"], r.calib_poses)
    assert isinstance(r.params["fine"], QuantizedNerfParams)


def test_cli_run_flag_rejects_geometry_overrides(tmp_path):
    """--run + hand-typed geometry is the exact failure mode run-dir
    serving exists to prevent; the CLI refuses the combination."""
    from cvnerf_tpu.server import build_parser, renderer_from_args
    args = build_parser().parse_args(["--run", "x", "--focal", "5"])
    with pytest.raises(SystemExit, match="--focal"):
        renderer_from_args(args)


def test_cli_without_run_requires_geometry():
    from cvnerf_tpu.server import build_parser, renderer_from_args
    args = build_parser().parse_args(["--ckpt", "x", "--height", "4"])
    with pytest.raises(SystemExit, match="--width"):
        renderer_from_args(args)


def test_cli_which_requires_run():
    """--which best with a bare --ckpt dir would silently serve the latest
    periodic step while the user believes they deployed the best-val model;
    the CLI refuses the combination (same contract as geometry overrides)."""
    from cvnerf_tpu.server import build_parser, renderer_from_args
    args = build_parser().parse_args(
        ["--ckpt", "x", "--height", "4", "--width", "4", "--focal", "2",
         "--near", "0.1", "--far", "1.0", "--which", "best"])
    with pytest.raises(SystemExit, match="--which requires --run"):
        renderer_from_args(args)


def test_render_video_returns_mp4(server_url):
    cv2 = pytest.importorskip("cv2")
    poses = [POSE, [[1.0, 0, 0, 0.1], [0, 1.0, 0, 0], [0, 0, 1.0, 4.0]]]
    with _post(server_url + "/render_video",
               {"poses": poses, "fps": 10}) as resp:
        assert resp.headers["Content-Type"] == "video/mp4"
        data = resp.read()
    assert len(data) > 100
    # decodable round trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "v.mp4")
        open(p, "wb").write(data)
        cap = cv2.VideoCapture(p)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
    assert n == 2


@pytest.mark.parametrize("payload,msg", [
    ({}, "poses"),
    ({"poses": [[[1, 2], [3, 4]]]}, "3,4"),
    ({"poses": [POSE], "fps": 0}, "fps"),
    ({"poses": [POSE] * 241}, "pose count"),
])
def test_render_video_bad_requests(server_url, payload, msg):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server_url + "/render_video", payload)
    assert ei.value.code == 400
    assert msg in json.loads(ei.value.read())["error"].replace("'", "")


def test_server_cli_exposes_ndc_flags():
    """Forward-facing (fern/skull) checkpoints need the NDC warp at serve
    time; the CLI must be able to express it (previously unreachable)."""
    from cvnerf_tpu.server import build_parser
    base = ["--ckpt", "x", "--height", "4", "--width", "4",
            "--focal", "4", "--near", "0", "--far", "1"]
    args = build_parser().parse_args(base)
    assert args.ndc is None          # None = not given (resolves to off)
    args = build_parser().parse_args(
        [*base, "--ndc", "--ndc_variant", "reference"])
    assert args.ndc is True and args.ndc_variant == "reference"


def test_cli_run_flag_rejects_ndc_overrides():
    """--ndc/--ndc_variant alongside --run must error, not be silently
    ignored (the snapshot's NDC mode is authoritative)."""
    from cvnerf_tpu.server import build_parser, renderer_from_args
    args = build_parser().parse_args(["--run", "x", "--ndc"])
    with pytest.raises(SystemExit, match="--ndc"):
        renderer_from_args(args)


def test_renderer_ndc_changes_output(tmp_path):
    """NerfRenderer must actually forward ndc= into the render (an ignored
    flag would silently serve unwarped rays)."""
    d = str(tmp_path / "ck")
    state = create_train_state(jax.random.PRNGKey(0), mlp=TINY)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    save_checkpoint(d, TrainState(params=params, opt_state=state.opt_state,
                                  step=state.step))
    kw = dict(height=8, width=8, focal=10.0, near=0.0, far=1.0,
              cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
              chunk=64, use_mesh=False)
    pose = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0.5]])
    a = NerfRenderer(d, ndc=False, **kw).render_pose(pose)
    b = NerfRenderer(d, ndc=True, **kw).render_pose(pose)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_server_with_occupancy(tmp_path):
    """The HTTP surface works with the occupancy grid active (both modes),
    and --occupancy wires through the CLI parser."""
    import threading as _t
    import urllib.request as _u
    d = str(tmp_path / "ckpt")
    state = create_train_state(jax.random.PRNGKey(2), mlp=TINY)
    params = state.params
    for net in ("coarse", "fine"):
        params[net]["alpha"]["b"] = params[net]["alpha"]["b"] + 1.0
    save_checkpoint(d, TrainState(params=params, opt_state=state.opt_state,
                                  step=3))
    r = NerfRenderer(d, height=10, width=10, focal=10.0, near=2.0, far=6.0,
                     cfg=RenderConfig(n_coarse=4, n_fine=4, mlp=TINY),
                     chunk=100, use_mesh=False)
    r.enable_occupancy(resolution=17, mode="full")
    srv = make_server(r, "127.0.0.1", 0)
    t = _t.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with _post(url + "/render", {"c2w": POSE, "format": "json"}) as resp:
            body = json.loads(resp.read())
        rgb = np.asarray(body["rgb"])
        assert rgb.shape == (10, 10, 3) and np.isfinite(rgb).all()
    finally:
        srv.shutdown()
        srv.server_close()

    from cvnerf_tpu.server import build_parser
    args = build_parser().parse_args(["--ckpt", d, "--occupancy", "full"])
    assert args.occupancy == "full" and args.occupancy_res == 192
