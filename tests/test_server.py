"""Stdlib web UI (reference gradio_app.py surface without gradio)."""

import io
import json
import threading
import urllib.request

import pytest

from open_pandora_tpu.pipeline.server import make_server


@pytest.fixture()
def server():
    calls = {}

    def fake_generate(image_bytes, actions, **kw):
        calls["image"] = image_bytes
        calls["actions"] = actions
        calls["kw"] = kw
        return b"MP4" + bytes(actions[0], "utf-8")

    srv = make_server(fake_generate, port=0, host="127.0.0.1")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, calls, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_health_and_index(server):
    _, _, base = server
    with urllib.request.urlopen(base + "/health") as r:
        assert json.load(r) == {"status": "ok"}
    with urllib.request.urlopen(base + "/") as r:
        page = r.read().decode()
    assert "Actions" in page and "Guidance" in page  # gradio_app.py:35-84


def test_generate_roundtrip(server):
    _, calls, base = server
    boundary = "XBOUNDARYX"
    parts = []
    for name, payload in (("image", b"\x89PNGFAKE"),
                          ("actions", b"drive\nturn left"),
                          ("ddim_steps", b"7"), ("ugs", b"3.5"),
                          ("seed", b"42")):
        parts.append(f'--{boundary}\r\nContent-Disposition: form-data; '
                     f'name="{name}"\r\n\r\n'.encode() + payload + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        base + "/generate", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "video/mp4"
        assert r.read() == b"MP4drive"
    assert calls["image"] == b"\x89PNGFAKE"
    assert calls["actions"] == ["drive", "turn left"]
    assert calls["kw"] == {"ddim_steps": 7, "ugs": 3.5, "seed": 42}


def test_generate_error_is_json(server):
    srv, _, base = server

    def boom(image_bytes, actions, **kw):
        raise RuntimeError("no chip")

    # rebind the generate_fn on the bound handler class
    srv.RequestHandlerClass.generate_fn = staticmethod(boom)
    req = urllib.request.Request(
        base + "/generate", data=b"junk",
        headers={"Content-Type": "multipart/form-data; boundary=zz"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 500
    assert "error" in json.load(e.value)
