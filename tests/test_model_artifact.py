"""AOT serving artifacts (utils/model_artifact.py): export -> load ->
serve must reproduce the live Rescorer exactly, refuse unknown shapes,
and plug into the serving layer unchanged."""
import json
import zipfile

import jax
import numpy as np
import pytest

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import (Config, DataConfig, ModelConfig,
                                  ParallelConfig)
from gossipnet_tpu.data.synthetic import synthetic_record
from gossipnet_tpu.utils import model_artifact as ma


def _tiny_setup(num_classes=1):
    cfg = Config(
        model=ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16, num_classes=num_classes,
                          pair_matmul_dtype="float32"),
        data=DataConfig(bucket_sizes=(64, 128)),
        parallel=ParallelConfig(enable="off"),
    )
    import jax

    from gossipnet_tpu.train import build_model

    model = build_model(cfg, "dense")
    n0 = 64
    init_args = [np.zeros((1, n0, 4), np.float32),
                 np.zeros((1, n0), np.float32),
                 np.ones((1, n0), bool)]
    if num_classes > 1:
        init_args.append(np.zeros((1, n0), np.int32))
    params = model.init(jax.random.key(0), *init_args)["params"]
    return cfg, params


def _images(k, num_classes=1, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(k):
        rec = synthetic_record(rng, i, num_gt=4, dets_per_gt=3,
                               num_clutter=4, num_classes=num_classes)
        cls = rec.det_classes if num_classes > 1 else None
        out.append((rec.det_boxes, rec.det_scores, cls))
    return out


def test_artifact_matches_live_rescorer(tmp_path):
    cfg, params = _tiny_setup()
    live = Rescorer(cfg, params, pool_impl="dense")
    path = tmp_path / "m.gnetart"
    meta = ma.export_artifact(cfg, params, path, batch_sizes=(1, 2),
                              pool_impl="dense")
    assert meta["format_version"] == ma.FORMAT_VERSION
    assert sorted(tuple(s) for s in meta["shapes"]) == [
        (1, 64), (1, 128), (2, 64), (2, 128)]

    art = ma.ArtifactRescorer(path)
    art.warmup()
    images = _images(3)
    got = art.rescore_batch(images, batch_size=2)
    want = live.rescore_batch(images, batch_size=2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    # single-image call path too
    bx, sc, _ = images[0]
    np.testing.assert_allclose(art(bx, sc), live(bx, sc),
                               rtol=1e-5, atol=1e-6)


def test_artifact_multiclass(tmp_path):
    cfg, params = _tiny_setup(num_classes=4)
    live = Rescorer(cfg, params, pool_impl="dense")
    path = tmp_path / "mc.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(2,),
                       pool_impl="dense")
    art = ma.ArtifactRescorer(path)
    images = _images(2, num_classes=4)
    got = art.rescore_batch(images, batch_size=2)
    want = live.rescore_batch(images, batch_size=2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_artifact_refuses_unknown_shapes(tmp_path):
    cfg, params = _tiny_setup()
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(2,),
                       pool_impl="dense")
    art = ma.ArtifactRescorer(path)
    # a 3-image group needs batch 4 > max exported 2
    with pytest.raises(KeyError, match="exports batches up to 2"):
        art.rescore_batch(_images(3), batch_size=3)
    # 1-image groups pad UP to the smallest exported batch (2) and work
    out = art.rescore_batch(_images(1), batch_size=1)
    assert len(out) == 1 and np.isfinite(out[0]).all()


def test_artifact_rejects_future_format(tmp_path):
    cfg, params = _tiny_setup()
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(1,),
                       pool_impl="dense")
    bumped = tmp_path / "future.gnetart"
    with zipfile.ZipFile(path) as zin, \
            zipfile.ZipFile(bumped, "w") as zout:
        for item in zin.namelist():
            data = zin.read(item)
            if item == "meta.json":
                meta = json.loads(data)
                meta["format_version"] = ma.FORMAT_VERSION + 1
                data = json.dumps(meta)
            zout.writestr(item, data)
    with pytest.raises(ValueError, match="format_version"):
        ma.ArtifactRescorer(bumped)


def test_cross_platform_tpu_export_from_cpu_host(tmp_path):
    """A TPU serving artifact — including the fused Pallas pair kernel
    (Mosaic lowers device-free) — can be built on a CPU-only machine:
    the CI/build-host deployment story. Execution parity is the
    tpu-marked test below."""
    cfg, params = _tiny_setup()
    path = tmp_path / "tpu.gnetart"
    meta = ma.export_artifact(cfg, params, path, batch_sizes=(1,),
                              pool_impl="pallas", platforms=("tpu",))
    assert meta["platforms"] == ["tpu"]
    assert meta["pool_impl"] == "pallas"
    assert ma.read_artifact_meta(path)["shapes"] == [[1, 64], [1, 128]]
    # loading on a CPU backend must still parse the container (calling
    # it would raise jax.export's platform check, not garbage)
    art = ma.ArtifactRescorer(path)
    assert art.cfg.model.num_blocks == cfg.model.num_blocks
    with pytest.raises(Exception, match="(?i)platform|tpu"):
        art(np.zeros((4, 4), np.float32), np.full((4,), 0.5, np.float32))


@pytest.mark.tpu
@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs real TPU (GNET_TPU=1 pytest -m tpu)")
def test_artifact_on_chip_parity(tmp_path):
    """On real hardware: a pallas artifact reproduces the live pallas
    Rescorer bit-for-bit shapes and near-exact values."""
    cfg, params = _tiny_setup()
    live = Rescorer(cfg, params, pool_impl="pallas")
    path = tmp_path / "chip.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(1, 2),
                       pool_impl="pallas")
    art = ma.ArtifactRescorer(path)
    images = _images(3)
    got = art.rescore_batch(images, batch_size=2)
    want = live.rescore_batch(images, batch_size=2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_tcp_server_clamps_to_artifact_batches(tmp_path):
    """TcpServer with a small-batch artifact must clamp its batch_size
    to the max exported batch instead of crashing at warmup (its
    default batch_size=8 would otherwise dispatch an unexported
    shape)."""
    import socket

    from gossipnet_tpu.serving import TcpServer

    cfg, params = _tiny_setup()
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(1, 2),
                       pool_impl="dense")
    art = ma.ArtifactRescorer(path)
    server = TcpServer(art, port=0, threshold=0.0).start()
    assert server.batch_size == 2
    try:
        bx, sc, _ = _images(1)[0]
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            s.sendall((json.dumps({"id": 3, "boxes": bx.tolist(),
                                   "scores": sc.tolist()}) + "\n").encode())
            resp = json.loads(f.readline())
        assert resp["id"] == 3 and len(resp["new_scores"]) == len(sc)
    finally:
        server.stop()


def test_artifact_through_serving_layer(tmp_path):
    """serve_stream (the CLI's default mode) over an ArtifactRescorer."""
    import io

    from gossipnet_tpu.serving import serve_stream

    cfg, params = _tiny_setup()
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(1, 2),
                       pool_impl="dense")
    art = ma.ArtifactRescorer(path)
    bx, sc, _ = _images(1)[0]
    req = json.dumps({"id": 7, "boxes": bx.tolist(),
                      "scores": sc.tolist()}) + "\n"
    out = io.StringIO()
    n = serve_stream(art, threshold=0.0, inp=io.StringIO(req), out=out)
    assert n == 1
    resp = json.loads(out.getvalue())
    assert resp["id"] == 7 and len(resp["new_scores"]) == len(sc)


def test_evaluate_cli_on_artifact(tmp_path, capsys):
    """`python -m gossipnet_tpu.evaluate --artifact X` reproduces the
    live-model eval exactly (the artifact-parity validation tool)."""
    from gossipnet_tpu import evaluate as ev
    from gossipnet_tpu.data.synthetic import synthetic_roidb
    from gossipnet_tpu.train import build_model

    cfg, params = _tiny_setup()
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(2,),
                       pool_impl="dense")

    ev.main(["--artifact", str(path)])
    out = capsys.readouterr().out
    stats = json.loads(out[out.index("{"):])
    assert 0.0 <= stats["gossipnet"]["AP"] <= 1.0

    # must equal the live model evaluated on the same roidb/batching
    model = build_model(cfg, "dense")
    roidb = synthetic_roidb(num_images=64, seed=123)
    want = ev.evaluate_model(params, model, roidb, batch_size=2,
                             bucket_sizes=cfg.data.bucket_sizes)
    assert stats["gossipnet"] == pytest.approx(want, abs=1e-9)

    # batch selection must pick an EXPORTED batch, not min(cfg, max):
    # cfg batch 8 vs exported {1, 4} -> evaluates at 4; exported {4}
    # alone (> any smaller config) -> evaluates at 4.
    for batches in ((1, 4), (4,)):
        p2 = tmp_path / f"m{len(batches)}.gnetart"
        ma.export_artifact(cfg, params, p2, batch_sizes=batches,
                           pool_impl="dense")
        ev.main(["--artifact", str(p2)])
        out2 = capsys.readouterr().out
        stats2 = json.loads(out2[out2.index("{"):])
        assert stats2["gossipnet"] == pytest.approx(want, abs=1e-9)
