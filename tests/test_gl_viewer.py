"""Interactive 6DoF viewer server (GlViewer equivalent): endpoint contract
over the golden fused stream — scene metadata, world-space mesh buffers
(cameraMeshVS displacement done host-side), decoded subframe color."""

import json
import os
import struct
import threading
import urllib.request

import numpy as np
import pytest

from facebook360_dep_tpu.viewer import server

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens/publish_mini")


@pytest.fixture(scope="module")
def viewer():
    httpd = server.serve(
        os.path.join(GOLDEN, "rigs/rig.json"), os.path.join(GOLDEN, "fused")
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_scene_metadata(viewer):
    scene = json.load(urllib.request.urlopen(viewer + "/scene.json"))
    assert scene["frames"] == ["000000"]
    assert [c["id"] for c in scene["cameras"]] == ["cam0"]
    assert len(scene["cameras"][0]["position"]) == 3


def test_mesh_buffer(viewer):
    buf = urllib.request.urlopen(viewer + "/mesh/000000/cam0.bin").read()
    nv, nf = struct.unpack_from("<II", buf)
    assert len(buf) == 8 + nv * 20 + nf * 12
    pos = np.frombuffer(buf, np.float32, nv * 3, 8).reshape(-1, 3)
    uv = np.frombuffer(buf, np.float32, nv * 2, 8 + nv * 12).reshape(-1, 2)
    idx = np.frombuffer(buf, np.uint32, nf * 3, 8 + nv * 20)
    # golden disparity is 0.15 +- 0.05 -> world points 5-10 m out
    r = np.linalg.norm(pos, axis=1)
    assert 3.0 < r.min() and r.max() < 12.0
    assert (uv >= -0.01).all() and (uv <= 1.01).all()
    assert idx.max() < nv


def test_color_png(viewer):
    import cv2

    png = urllib.request.urlopen(viewer + "/color/000000/cam0.png").read()
    img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (48, 64, 3)
    assert img.std() > 10  # textured content survived BC7 + decode


def test_page_served(viewer):
    html = urllib.request.urlopen(viewer + "/").read().decode()
    # the RigScene pipeline pieces are present: exponential accumulation
    # (exponentialFS), premultiplied blend, fade resolve, frustum culling
    for needle in (
        "webgl2", "EXT_color_buffer_float", "exp(30.0 * color.a) - 1.0",
        "blendFuncSeparate(gl.SRC_ALPHA, gl.ONE, gl.ONE, gl.ONE)",
        "fade * a.rgb / a.a", "cameraVisible", "DEPTH_COMPONENT24", "bgmesh",
    ):
        assert needle in html, needle
    assert urllib.request.urlopen(viewer + "/scene.json").status == 200


def test_scene_cull_points(viewer):
    scene = json.load(urllib.request.urlopen(viewer + "/scene.json"))
    pts = scene["cameras"][0]["cull_points"]
    # 4x4 fractional grid minus the 4 corners (isVisible, RigScene.cpp:1052)
    assert len(pts) == 12
    # near-infinity points: ~1e4 m from the camera
    p0 = np.asarray(scene["cameras"][0]["position"])
    d = np.linalg.norm(np.asarray(pts) - p0, axis=1)
    assert (d > 9e3).all() and (d < 1.1e4).all()
    assert scene["background"] is False


def test_404(viewer):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(viewer + "/nope")
    assert e.value.code == 404
