"""Serving export (eval/serving.py): the AOT artifact computes the same
predictions as the live inference path, round-trips through bytes on disk,
and the CLI writes artifact + manifest."""

import json
import os

import jax
import numpy as np
import pytest

from mcseg_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
from mcseg_tpu.eval.serving import export_serving, load_serving, make_serve_fn
from mcseg_tpu.train.state import create_train_state


def _setup(input_ch=3, n_class=8, fusion="single"):
    cfg = ExperimentConfig(
        model=ModelConfig(net="drn_d_22", input_ch=input_ch, n_class=n_class,
                          dtype="float32", fusion=fusion),
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=2, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=input_ch),
        train=TrainConfig(),
    )
    state, _, _ = create_train_state(cfg.model, cfg.train, jax.random.key(0),
                                     img_shape=(32, 32))
    return cfg, state


def test_exported_artifact_matches_live_inference(tmp_path):
    cfg, state = _setup()
    rng = np.random.RandomState(0)
    batch = {"image": rng.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8)}

    serve = jax.jit(make_serve_fn(cfg, state.params, state.batch_stats))
    live = np.asarray(serve(batch))

    path = str(tmp_path / "m.shlo")
    manifest = export_serving(cfg, state.params, state.batch_stats, path,
                              batch=2, platforms=("cpu",))
    assert manifest["bytes"] > 0 and manifest["platforms"] == ["cpu"]
    pred = np.asarray(load_serving(path)(batch))
    assert pred.shape == (2, 32, 32) and pred.dtype == np.int32
    np.testing.assert_array_equal(pred, live)


def test_export_depth_input_and_probs(tmp_path):
    # input_ch=6: raw depth plane -> on-device HHA inside the artifact
    cfg, state = _setup(input_ch=6)
    rng = np.random.RandomState(1)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "depth": (rng.rand(1, 32, 32) * 4 + 0.5).astype(np.float32),
    }
    path = str(tmp_path / "m6.shlo")
    manifest = export_serving(cfg, state.params, state.batch_stats, path,
                              batch=1, platforms=("cpu",), with_probs=True)
    assert "depth" in manifest["input_spec"]
    pred, probs = load_serving(path)(batch)
    assert np.asarray(pred).shape == (1, 32, 32)
    probs = np.asarray(probs)
    assert probs.shape == (1, 32, 32, cfg.model.n_class)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    from mcseg_tpu.tools.export_serving import main as export_main
    from mcseg_tpu.utils.checkpoint import save_checkpoint

    cfg, state = _setup()
    save_checkpoint(str(tmp_path / "ck"), state, cfg)
    out = str(tmp_path / "model.shlo")
    export_main([str(tmp_path / "ck"), "--out", out, "--batch", "1",
                 "--platforms", "cpu"])
    with open(out + ".json") as f:
        manifest = json.load(f)
    assert manifest["net"] == "drn_d_22"
    assert manifest["input_spec"]["image"]["shape"] == [1, 32, 32, 3]
    batch = {"image": np.zeros((1, 32, 32, 3), np.uint8)}
    assert np.asarray(load_serving(out)(batch)).shape == (1, 32, 32)


def test_export_tolerates_missing_data_root(tmp_path):
    import dataclasses

    cfg, state = _setup()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, tgt_dataset="nyu", data_root="/nonexistent/training/host"))
    m = export_serving(cfg, state.params, state.batch_stats,
                       str(tmp_path / "m.shlo"), batch=1, platforms=("cpu",))
    # falls back to the checkpoint's test_img_shape geometry
    assert m["input_spec"]["image"]["shape"] == [1, 32, 32, 3]


def test_export_precomputed_hha_plane(tmp_path):
    # input_ch=6 trained on precomputed HHA files (hha_on_device=False):
    # the artifact must ingest a uint8 'hha' plane, NOT raw depth
    import dataclasses

    cfg, state = _setup(input_ch=6)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, hha_on_device=False))
    path = str(tmp_path / "mh.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert m["extra_plane"] == "hha" and "depth" not in m["input_spec"]
    rng = np.random.RandomState(2)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "hha": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
    }
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)


def test_export_depth_only_needs_no_image(tmp_path):
    # input_ch=1: the RGB plane is dead code; clients ship only depth
    cfg, state = _setup(input_ch=1)
    path = str(tmp_path / "m1.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert list(m["input_spec"]) == ["depth"]
    assert "per-batch depth max" in m["note"]
    batch = {"depth": (np.random.RandomState(3).rand(1, 32, 32) * 4 + 0.5)
             .astype(np.float32)}
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)


def test_serve_requires_image_for_rgb_checkpoints():
    cfg, state = _setup(input_ch=3)
    serve = make_serve_fn(cfg, state.params, state.batch_stats)
    with pytest.raises(ValueError, match="consumes RGB"):
        serve({"depth": np.ones((1, 32, 32), np.float32)})


def test_export_extra_plane_validation():
    import dataclasses

    cfg, state = _setup(input_ch=3)
    with pytest.raises(ValueError, match="conflicts with"):
        export_serving(cfg, state.params, state.batch_stats, "/tmp/x.shlo",
                       platforms=("cpu",), extra_plane="depth")
    with pytest.raises(ValueError, match="must be"):
        export_serving(cfg, state.params, state.batch_stats, "/tmp/x.shlo",
                       platforms=("cpu",), extra_plane="edges")
    with pytest.raises(ValueError, match="conflicts with"):
        export_serving(cfg, state.params, state.batch_stats, "/tmp/x.shlo",
                       platforms=("cpu",), extra_plane="boundary")
    cfg6, state6 = _setup(input_ch=6)
    with pytest.raises(ValueError, match="only valid for input_ch 4"):
        export_serving(cfg6, state6.params, state6.batch_stats, "/tmp/x.shlo",
                       platforms=("cpu",), extra_plane="boundary")
    with pytest.raises(ValueError, match="only valid for input_ch 1/4"):
        export_serving(cfg6, state6.params, state6.batch_stats, "/tmp/x.shlo",
                       platforms=("cpu",), extra_plane="ir")
    # ir-corpus default for input_ch=6 must resolve to depth/hha, never 'ir'
    cfg6ir = dataclasses.replace(
        cfg6, data=dataclasses.replace(cfg6.data, tgt_dataset="ir"))
    m = export_serving(cfg6ir, state6.params, state6.batch_stats,
                       "/tmp/x6ir.shlo", batch=1, platforms=("cpu",))
    assert m["extra_plane"] == "depth"


def test_export_ir_corpus_default_introspects_or_flags(tmp_path):
    import dataclasses
    import os

    from PIL import Image

    cfg, state = _setup(input_ch=4)
    # unreachable corpus: defaults to depth + a manifest ambiguity note
    cfg_ir = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, tgt_dataset="ir",
                                      data_root="/nonexistent"))
    m = export_serving(cfg_ir, state.params, state.batch_stats,
                       str(tmp_path / "a.shlo"), batch=1, platforms=("cpu",))
    assert m["extra_plane"] == "depth" and "plane_note" in m
    # reachable ir corpus WITHOUT depth dirs: training consumed IR -> 'ir'
    root = tmp_path / "ir"
    rng = np.random.RandomState(0)
    for i in range(2):
        os.makedirs(root / "val_rgb", exist_ok=True)
        os.makedirs(root / "val_label", exist_ok=True)
        os.makedirs(root / "val_ir", exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
                        ).save(root / "val_rgb" / f"{i:04d}.png")
        Image.fromarray(rng.randint(0, 19, (32, 32)).astype(np.uint8)
                        ).save(root / "val_label" / f"{i:04d}.png")
        Image.fromarray(rng.randint(0, 255, (32, 32)).astype(np.uint8)
                        ).save(root / "val_ir" / f"{i:04d}.png")
    cfg_ir2 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, tgt_dataset="ir",
                                      data_root=str(tmp_path)))
    m2 = export_serving(cfg_ir2, state.params, state.batch_stats,
                        str(tmp_path / "b.shlo"), batch=1, platforms=("cpu",))
    assert m2["extra_plane"] == "ir" and "plane_note" not in m2


def test_http_serving_host(tmp_path):
    """tools/serve_http: export -> serve -> POST a PNG -> the returned label
    PNG equals the direct artifact call; /healthz echoes the manifest;
    missing planes get a 400."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from mcseg_tpu.tools.serve_http import make_server

    cfg, state = _setup(input_ch=3)
    path = str(tmp_path / "m.shlo")
    export_serving(cfg, state.params, state.batch_stats, path,
                   batch=1, platforms=("cpu",))

    srv = make_server(path, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        health = json.loads(urllib.request.urlopen(url + "/healthz").read())
        assert health["net"] == "drn_d_22"

        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            url + "/predict",
            data=json.dumps(
                {"image": base64.b64encode(buf.getvalue()).decode()}).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["shape"] == [32, 32]
        got = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(resp["pred_png"]))))
        want = np.asarray(load_serving(path)({"image": img[None]}))[0]
        np.testing.assert_array_equal(got, want)
        assert sum(resp["classes"].values()) == 32 * 32

        # missing plane -> 400 with a helpful error
        bad = urllib.request.Request(
            url + "/predict", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "missing plane" in e.read().decode()
    finally:
        srv.shutdown()


def test_http_serving_host_depth_plane(tmp_path):
    """RGB-D artifact over HTTP: the 16-bit millimeter depth PNG decodes to
    meters and feeds the on-device HHA encode inside the artifact."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from mcseg_tpu.tools.serve_http import make_server

    cfg, state = _setup(input_ch=6)
    path = str(tmp_path / "m6.shlo")
    export_serving(cfg, state.params, state.batch_stats, path,
                   batch=1, platforms=("cpu",))
    srv = make_server(path, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
        dmm = (rng.rand(32, 32) * 4000 + 500).astype(np.uint16)
        bi, bd = io.BytesIO(), io.BytesIO()
        Image.fromarray(img).save(bi, format="PNG")
        Image.fromarray(dmm).save(bd, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/predict",
            data=json.dumps({
                "image": base64.b64encode(bi.getvalue()).decode(),
                "depth": base64.b64encode(bd.getvalue()).decode(),
            }).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.loads(urllib.request.urlopen(req).read())
        got = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(resp["pred_png"]))))
        want = np.asarray(load_serving(path)(
            {"image": img[None],
             "depth": (dmm.astype(np.float32) / 1000.0)[None]}))[0]
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()


def test_http_serving_corrupt_image_gets_400(tmp_path):
    """Undecodable image bytes must produce the documented JSON 400, not a
    dropped connection (PIL's UnidentifiedImageError is an OSError)."""
    import base64
    import json
    import threading
    import urllib.error
    import urllib.request

    from mcseg_tpu.tools.serve_http import make_server

    cfg, state = _setup(input_ch=3)
    path = str(tmp_path / "m.shlo")
    export_serving(cfg, state.params, state.batch_stats, path,
                   batch=1, platforms=("cpu",))
    srv = make_server(path, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/predict",
            data=json.dumps(
                {"image": base64.b64encode(b"not a png").decode()}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        assert "error" in json.loads(e.value.read())
    finally:
        srv.shutdown()


def test_export_multitask_serves_depth_head(tmp_path):
    """A multitask checkpoint ('D' subtree) exports pred + metric depth by
    default; the HTTP host ships the depth as a millimeter PNG."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    from PIL import Image

    from mcseg_tpu.core.config import DataConfig, ExperimentConfig
    from mcseg_tpu.tools.serve_http import make_server
    from mcseg_tpu.train.multitask import init_multitask_state

    mcfg = ModelConfig(net="drn_d_22", input_ch=3, n_class=6, dtype="float32")
    tcfg = TrainConfig()
    state, *_ = init_multitask_state(mcfg, tcfg, jax.random.key(0),
                                     img_shape=(32, 32))
    cfg = ExperimentConfig(
        model=mcfg,
        data=DataConfig(src_dataset="synthetic", tgt_dataset="synthetic",
                        batch_size=1, train_img_shape=(32, 32),
                        test_img_shape=(32, 32), input_ch=3),
        train=tcfg,
    )
    path = str(tmp_path / "mt.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert m["outputs"] == ["pred", "depth"]
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    pred, depth = load_serving(path)({"image": img})
    assert np.asarray(pred).shape == (1, 32, 32)
    d = np.asarray(depth)
    assert d.shape == (1, 32, 32) and d.dtype == np.float32

    # pred-only opt-out
    m2 = export_serving(cfg, state.params, state.batch_stats,
                        str(tmp_path / "mt2.shlo"), batch=1,
                        platforms=("cpu",), with_depth=False)
    assert m2["outputs"] == ["pred"]

    # HTTP host attaches the millimeter depth PNG
    srv = make_server(path, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        Image.fromarray(img[0]).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/predict",
            data=_json.dumps(
                {"image": base64.b64encode(buf.getvalue()).decode()}).encode(),
            headers={"Content-Type": "application/json"})
        resp = _json.loads(urllib.request.urlopen(req).read())
        dmm = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(resp["depth_mm_png"]))))
        assert dmm.shape == (32, 32) and dmm.dtype == np.uint16
        np.testing.assert_allclose(
            dmm, np.clip(d[0] * 1000.0, 0, 65535).astype(np.uint16))
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_export_cli_bucketed_batches(tmp_path):
    """--batch 1,2 writes one artifact per size, each independently loadable
    at its own static batch."""
    from mcseg_tpu.tools.export_serving import main as export_main
    from mcseg_tpu.utils.checkpoint import save_checkpoint

    cfg, state = _setup()
    save_checkpoint(str(tmp_path / "ck"), state, cfg)
    out = str(tmp_path / "m.shlo")
    manifests = export_main([str(tmp_path / "ck"), "--out", out,
                             "--batch", "1,2", "--platforms", "cpu"])
    assert [m["input_spec"]["image"]["shape"][0] for m in manifests] == [1, 2]
    for b in (1, 2):
        pred = load_serving(f"{out}.b{b}")(
            {"image": np.zeros((b, 32, 32, 3), np.uint8)})
        assert np.asarray(pred).shape == (b, 32, 32)


def test_http_geometry_mismatch_400_and_auto_resize_optin(tmp_path):
    """A wrong-size client plane gets HTTP 400 (the manifest advertises an
    exact input spec); --auto_resize restores the lenient resize behavior.
    An oversized request body is rejected 413 before being read."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from PIL import Image

    from mcseg_tpu.tools.serve_http import make_server

    cfg, state = _setup(input_ch=3)
    path = str(tmp_path / "m.shlo")
    export_serving(cfg, state.params, state.batch_stats, path,
                   batch=1, platforms=("cpu",))

    rng = np.random.RandomState(3)
    big = rng.randint(0, 255, (64, 48, 3)).astype(np.uint8)  # != 32x32 spec
    buf = io.BytesIO()
    Image.fromarray(big).save(buf, format="PNG")
    body = _json.dumps(
        {"image": base64.b64encode(buf.getvalue()).decode()}).encode()

    srv = make_server(path, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
        assert "--auto_resize" in _json.loads(e.value.read())["error"]
    finally:
        srv.shutdown()

    # opt-in resize: same request succeeds and returns the spec geometry
    srv = make_server(path, port=0, allow_resize=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        resp = _json.loads(urllib.request.urlopen(req).read())
        assert resp["shape"] == [32, 32]
    finally:
        srv.shutdown()

    # bogus/oversized Content-Length -> 413 without reading the body
    srv = make_server(path, port=0, max_body=1024)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 413
    finally:
        srv.shutdown()


def test_export_serving_is_atomic(tmp_path, monkeypatch):
    """A crash mid-export leaves no artifact/manifest at the final paths
    (tmp + os.replace, the checkpoint atomicity contract)."""
    import mcseg_tpu.eval.serving as serving_mod

    cfg, state = _setup()
    path = str(tmp_path / "m.shlo")

    real_replace = os.replace
    calls = []

    def boom(src, dst):
        calls.append((src, dst))
        raise RuntimeError("simulated crash during finalize")

    monkeypatch.setattr(serving_mod.os, "replace", boom)
    with pytest.raises(RuntimeError):
        export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    # the final artifact path must not exist (only the .tmp may)
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".json")

    monkeypatch.setattr(serving_mod.os, "replace", real_replace)
    export_serving(cfg, state.params, state.batch_stats, path,
                   batch=1, platforms=("cpu",))
    assert os.path.exists(path) and os.path.exists(path + ".json")


def test_export_boundary_input_channel(tmp_path):
    # input_ch=7 (rgb+hha+boundary): artifact ingests image + depth (HHA
    # encoded on device) + the implicit uint8 boundary plane
    cfg, state = _setup(input_ch=7)
    path = str(tmp_path / "m7.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert set(m["input_spec"]) == {"image", "depth", "boundary"}
    rng = np.random.RandomState(4)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "depth": (rng.rand(1, 32, 32) * 4 + 0.5).astype(np.float32),
        "boundary": (rng.rand(1, 32, 32) < 0.1).astype(np.uint8) * 255,
    }
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)


def test_export_late_fusion_checkpoint(tmp_path):
    """fusion='late' (BASELINE config 5 — the named throughput family) was
    the one checkpoint family with no serving-export coverage (VERDICT r3
    weak #3): artifact == live inference, and the HTTP host serves it from
    RGB + millimeter-depth PNGs."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    from PIL import Image

    from mcseg_tpu.tools.serve_http import make_server

    cfg, state = _setup(input_ch=6, fusion="late")
    rng = np.random.RandomState(6)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "depth": (rng.rand(1, 32, 32) * 4 + 0.5).astype(np.float32),
    }
    live = np.asarray(
        jax.jit(make_serve_fn(cfg, state.params, state.batch_stats))(batch))

    path = str(tmp_path / "late.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",))
    assert m["extra_plane"] == "depth"  # dual-branch HHA encode on device
    pred = np.asarray(load_serving(path)(batch))
    np.testing.assert_array_equal(pred, live)

    srv = make_server(path, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        bi, bd = io.BytesIO(), io.BytesIO()
        Image.fromarray(batch["image"][0]).save(bi, format="PNG")
        dmm = np.round(batch["depth"][0] * 1000.0).astype(np.uint16)
        Image.fromarray(dmm).save(bd, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/predict",
            data=_json.dumps({
                "image": base64.b64encode(bi.getvalue()).decode(),
                "depth": base64.b64encode(bd.getvalue()).decode(),
            }).encode(),
            headers={"Content-Type": "application/json"})
        resp = _json.loads(urllib.request.urlopen(req).read())
        got = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(resp["pred_png"]))))
        want = np.asarray(load_serving(path)(
            {"image": batch["image"],
             "depth": (dmm.astype(np.float32) / 1000.0)[None]}))[0]
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()


def test_export_input_ch4_boundary_plane(tmp_path):
    # input_ch=4 with extra_plane='boundary' (rgb+boundary, no depth corpus)
    cfg, state = _setup(input_ch=4)
    path = str(tmp_path / "m4b.shlo")
    m = export_serving(cfg, state.params, state.batch_stats, path,
                       batch=1, platforms=("cpu",), extra_plane="boundary")
    assert m["extra_plane"] == "boundary"
    assert set(m["input_spec"]) == {"image", "boundary"}
    rng = np.random.RandomState(5)
    batch = {
        "image": rng.randint(0, 255, (1, 32, 32, 3)).astype(np.uint8),
        "boundary": (rng.rand(1, 32, 32) < 0.1).astype(np.uint8) * 255,
    }
    assert np.asarray(load_serving(path)(batch)).shape == (1, 32, 32)
