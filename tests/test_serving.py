"""Serving layer: batching engine semantics, service == direct-API parity,
and the HTTP front end end-to-end (CPU, tiny shapes)."""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.data.vocab import build_word_map
from lrp_imagecaptioning_tpu.explain import build_explainer
from lrp_imagecaptioning_tpu.models.captioner import Captioner
from lrp_imagecaptioning_tpu.serving import (
    BatchingEngine, CaptionService, ExplainService, explanation_payload,
    make_http_server)
from lrp_imagecaptioning_tpu.serving.http_api import warm_services


# ---------------------------------------------------------------- engine ----

def test_engine_coalesces_and_preserves_order():
    seen = []

    def run_batch(payloads):
        seen.append(len(payloads))
        return [p * 2 for p in payloads]

    eng = BatchingEngine(run_batch, 4, max_delay_s=0.2).start()
    try:
        futs = [eng.submit(i) for i in range(5)]
        assert [f.result(timeout=5) for f in futs] == [0, 2, 4, 6, 8]
    finally:
        eng.stop()
    # 5 submissions into max_batch=4 -> at most 2 batches, none bigger than 4
    assert sum(seen) == 5 and len(seen) <= 2 and max(seen) <= 4
    snap = eng.stats()
    assert snap["completed"] == 5 and snap["errors"] == 0
    assert snap["batches"] == len(seen)


def test_engine_failure_isolates_batch_and_survives():
    def run_batch(payloads):
        if any(p < 0 for p in payloads):
            raise ValueError("bad payload")
        return payloads

    eng = BatchingEngine(run_batch, 2, max_delay_s=0.05).start()
    try:
        bad = eng.submit(-1)
        with pytest.raises(ValueError):
            bad.result(timeout=5)
        ok = eng.submit(7)
        assert ok.result(timeout=5) == 7
        assert eng.stats()["errors"] >= 1
    finally:
        eng.stop()


def test_engine_pipeline_overlaps_dispatch_with_finalize():
    """With a dispatch/finalize pair and depth>1, the worker must dispatch
    batch N+1 while batch N is still being finalized (the serving win on a
    high-latency device link), preserving order and results."""
    import time as _time

    events = []
    ev_lock = threading.Lock()

    def dispatch(payloads):
        with ev_lock:
            events.append(("dispatch", tuple(payloads)))
        return [p * 10 for p in payloads]

    def finalize(handle, payloads):
        _time.sleep(0.15)  # slow readback — the window for overlap
        with ev_lock:
            events.append(("finalize", tuple(payloads)))
        return handle

    eng = BatchingEngine(None, 2, max_delay_s=0.01, dispatch=dispatch,
                         finalize=finalize, pipeline_depth=3).start()
    try:
        futs = [eng.submit(i) for i in range(6)]
        assert [f.result(timeout=5) for f in futs] == [0, 10, 20, 30, 40, 50]
    finally:
        eng.stop()
    # all dispatches happen before the LAST finalize; with 3 batches and a
    # 0.15 s finalize, a synchronous loop could never do that
    kinds = [k for k, _ in events]
    assert kinds.count("dispatch") == kinds.count("finalize") >= 3
    assert kinds[:2] == ["dispatch", "dispatch"]  # overlap happened
    # order preserved per phase
    d = [p for k, p in events if k == "dispatch"]
    f = [p for k, p in events if k == "finalize"]
    assert d == f
    snap = eng.stats()
    assert snap["pipeline_depth"] == 3
    assert snap["mean_dispatch_ms"] < snap["mean_run_ms"]


def test_engine_pipeline_failures_isolate_per_phase():
    def dispatch(payloads):
        if any(p == -1 for p in payloads):
            raise ValueError("dispatch boom")
        return payloads

    def finalize(handle, payloads):
        if any(p == -2 for p in payloads):
            raise ValueError("finalize boom")
        return handle

    eng = BatchingEngine(None, 1, max_delay_s=0.01, dispatch=dispatch,
                         finalize=finalize, pipeline_depth=2).start()
    try:
        with pytest.raises(ValueError, match="dispatch boom"):
            eng.submit(-1).result(timeout=5)
        with pytest.raises(ValueError, match="finalize boom"):
            eng.submit(-2).result(timeout=5)
        assert eng.submit(3).result(timeout=5) == 3  # engine survives both
        assert eng.stats()["errors"] == 2
    finally:
        eng.stop()


def test_engine_pipeline_stop_drains_inflight():
    """Batches dispatched but not yet finalized at stop() must not hang
    callers: either they complete (worker handed them off before the join)
    or their futures fail with 'engine stopped'."""
    import time as _time

    release = threading.Event()

    def finalize(handle, payloads):
        release.wait(timeout=5)
        _time.sleep(0.05)
        return handle

    eng = BatchingEngine(None, 1, max_delay_s=0.001,
                         dispatch=lambda ps: ps, finalize=finalize,
                         pipeline_depth=4).start()
    futs = [eng.submit(i) for i in range(4)]
    _time.sleep(0.2)  # let the worker dispatch several
    release.set()
    eng.stop()
    for f in futs:
        try:
            f.result(timeout=1)
        except RuntimeError as e:
            assert "engine stopped" in str(e)


def test_engine_constructor_validation():
    with pytest.raises(ValueError, match="pair"):
        BatchingEngine(None, 2, dispatch=lambda p: p)
    with pytest.raises(ValueError, match="run_batch or"):
        BatchingEngine(None, 2)
    with pytest.raises(ValueError, match="pipeline_depth"):
        BatchingEngine(None, 2, dispatch=lambda p: p,
                       finalize=lambda h, p: h, pipeline_depth=0)


def test_engine_stop_fails_pending():
    eng = BatchingEngine(lambda ps: ps, 2, max_delay_s=0.01)
    fut = eng.submit(1)  # never started -> queue drains at stop()
    eng.stop()
    with pytest.raises(RuntimeError):
        fut.result(timeout=1)
    with pytest.raises(RuntimeError):
        eng.submit(2)


# ------------------------------------------------------------- fixtures ----

@pytest.fixture(scope="module")
def tiny_setup():
    wm = build_word_map([[f"w{i}"] for i in range(25)], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=len(wm), height=64, width=64)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = rng.normal(size=(5, 64, 64, 3)).astype(np.float32)
    return cap, params, wm, images


# ------------------------------------------------------------- services ----

def test_explain_batch_arrays_matches_single(tiny_setup):
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    batch = expl.explain_batch_arrays(images[:2])
    for i, exp in enumerate(batch):
        single = expl.explain_caption_arrays(images[i : i + 1])
        assert exp.caption == single.caption
        np.testing.assert_allclose(exp.relevance_images,
                                   single.relevance_images,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(exp.relevance_words,
                                   single.relevance_words,
                                   rtol=1e-5, atol=1e-6)


def test_guided_grad_cam_batch_arrays_matches_single(tiny_setup):
    cap, params, wm, images = tiny_setup
    expl = build_explainer("guided_grad_cam", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    batch = expl.explain_batch_arrays(images[:2])
    single = expl.explain_caption_arrays(images[:1])
    assert batch[0].caption == single.caption
    np.testing.assert_allclose(batch[0].relevance_images,
                               single.relevance_images,
                               rtol=1e-5, atol=1e-6)


def test_explain_service_parity_and_padding(tiny_setup):
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    svc = ExplainService(expl, batch_size=4, max_delay_s=0.2).start()
    try:
        svc.warmup()
        # 3 concurrent requests coalesce into one padded batch of 4
        futs = [svc.submit(images[i]) for i in range(3)]
        exps = [f.result(timeout=120) for f in futs]
    finally:
        svc.stop()
    for i, exp in enumerate(exps):
        single = expl.explain_caption_arrays(images[i : i + 1])
        assert exp.caption == single.caption
        np.testing.assert_allclose(exp.relevance_images,
                                   single.relevance_images,
                                   rtol=1e-5, atol=1e-6)
    stats = svc.stats()
    assert stats["completed"] == 3
    # the warmup batch is not a request; the 3 requests ran in >= 1 batch
    assert stats["batches"] >= 1


def test_explain_service_rejects_bad_shape(tiny_setup):
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    svc = ExplainService(expl, batch_size=2)
    with pytest.raises(ValueError, match="expected input shape"):
        svc.submit(np.zeros((32, 32, 3), np.float32))


def test_caption_service_beam_matches_direct(tiny_setup):
    cap, params, wm, images = tiny_setup
    svc = CaptionService(cap, params, wm, batch_size=2, decode="beam",
                         beam_size=2, max_cap_length=6,
                         max_delay_s=0.2).start()
    try:
        svc.warmup()
        futs = [svc.submit(images[i]) for i in range(3)]
        results = [f.result(timeout=120) for f in futs]
    finally:
        svc.stop()
    from lrp_imagecaptioning_tpu.data.vocab import decode_to_words

    for i, res in enumerate(results):
        feats = cap.encode(params, images[i : i + 1])
        beam = cap.beam_search_single(params, feats, wm, beam_size=2,
                                      max_cap_length=6)
        want = decode_to_words(
            np.asarray(beam.tokens)[: int(beam.length)], wm)
        trimmed = list(want)
        while trimmed and trimmed[-1] in set(svc.bad_endings):
            trimmed.pop()
        assert res["caption"] == (trimmed if trimmed else want)


def test_caption_service_greedy(tiny_setup):
    cap, params, wm, images = tiny_setup
    svc = CaptionService(cap, params, wm, batch_size=2, decode="greedy",
                         max_cap_length=6).start()
    try:
        res = svc(images[0])
    finally:
        svc.stop()
    assert isinstance(res["caption"], list)
    assert all(isinstance(w, str) for w in res["caption"])


def test_explain_service_summary_matches_full(tiny_setup):
    """payload='summary' (device-side reduction, maps never transfer) must
    produce exactly the JSON explanation_payload renders for the full-path
    result with include_relevance=False."""
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    svc = ExplainService(expl, batch_size=2, payload="summary").start()
    try:
        got = svc(images[0])
    finally:
        svc.stop()
    want = explanation_payload(expl.explain_caption_arrays(images[:1]))
    assert got["caption"] == want["caption"]
    assert got["tokens"] == want["tokens"]
    np.testing.assert_allclose(got["relevance_words"],
                               want["relevance_words"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["betas"], want["betas"],
                               rtol=1e-5, atol=1e-6)
    for key in ("sum", "max", "min"):
        np.testing.assert_allclose(got["relevance_stats"][key],
                                   want["relevance_stats"][key],
                                   rtol=1e-4, atol=1e-6)
    assert sorted(got) == sorted(want)


def test_services_mesh_mode_match_single_device(tiny_setup, eight_devices):
    """mesh= services shard each batch's rows over the data axis and must
    reproduce the single-device results exactly (shard-local programs, no
    collectives — the v5e-8 serving path)."""
    from lrp_imagecaptioning_tpu.config import MeshConfig
    from lrp_imagecaptioning_tpu.parallel import build_mesh

    cap, params, wm, images = tiny_setup
    mesh = build_mesh(MeshConfig(data_parallel=4), eight_devices[:4])
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)

    svc = ExplainService(expl, batch_size=4, payload="summary",
                         mesh=mesh).start()
    try:
        got = svc(images[0])
    finally:
        svc.stop()
    want = explanation_payload(expl.explain_caption_arrays(images[:1]))
    assert got["caption"] == want["caption"]
    np.testing.assert_allclose(got["relevance_words"],
                               want["relevance_words"], rtol=1e-5, atol=1e-6)
    for key in ("sum", "max", "min"):
        np.testing.assert_allclose(got["relevance_stats"][key],
                                   want["relevance_stats"][key],
                                   rtol=1e-4, atol=1e-6)

    svc = ExplainService(expl, batch_size=4, payload="full",
                         mesh=mesh).start()
    try:
        got_full = svc(images[0])
    finally:
        svc.stop()
    direct = expl.explain_caption_arrays(images[:1])
    assert got_full.caption == direct.caption
    np.testing.assert_allclose(got_full.relevance_images,
                               direct.relevance_images,
                               rtol=1e-5, atol=1e-6)

    csvc = CaptionService(cap, params, wm, batch_size=4, decode="beam",
                          beam_size=2, max_cap_length=6, mesh=mesh).start()
    try:
        got_cap = csvc(images[0])
    finally:
        csvc.stop()
    plain = CaptionService(cap, params, wm, batch_size=4, decode="beam",
                           beam_size=2, max_cap_length=6).start()
    try:
        want_cap = plain(images[0])
    finally:
        plain.stop()
    assert got_cap == want_cap

    with pytest.raises(ValueError, match="divide evenly"):
        ExplainService(expl, batch_size=3, payload="summary", mesh=mesh)


def test_explain_service_summary_rejects_composite_payloads(tiny_setup):
    cap, params, wm, _ = tiny_setup
    expl = build_explainer("guided_grad_cam", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    with pytest.raises(ValueError, match="composite relevance payload"):
        ExplainService(expl, batch_size=2, payload="summary")
    with pytest.raises(ValueError, match="payload must be"):
        ExplainService(expl, batch_size=2, payload="tiny")


# ------------------------------------------------------------------ http ----

def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.load(r)


def test_http_server_end_to_end(tiny_setup):
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    services = {
        "caption": CaptionService(cap, params, wm, batch_size=2,
                                  decode="greedy", max_cap_length=6,
                                  max_delay_s=0.02).start(),
        "explain": ExplainService(expl, batch_size=2,
                                  max_delay_s=0.02).start(),
    }
    server = make_http_server(services, "127.0.0.1", 0)
    warm_services(server, services, background=False)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.load(r)
        assert health["ok"] and health["warm"]
        assert health["services"] == ["caption", "explain"]

        img = images[0]
        b64 = {"b64": base64.b64encode(img.tobytes()).decode(),
               "shape": list(img.shape)}
        status, cap_out = _post(base + "/caption", {"image": b64})
        assert status == 200 and isinstance(cap_out["caption"], list)

        status, exp_out = _post(base + "/explain",
                                {"image": b64, "include_relevance": True})
        assert status == 200
        direct = expl.explain_caption_arrays(img[None])
        assert exp_out["caption"] == direct.caption
        rel = np.frombuffer(
            base64.b64decode(exp_out["relevance_images"]["b64"]),
            dtype=np.float32).reshape(exp_out["relevance_images"]["shape"])
        np.testing.assert_allclose(rel, direct.relevance_images,
                                   rtol=1e-5, atol=1e-6)
        assert len(exp_out["relevance_stats"]["sum"]) == len(direct.caption)

        # nested-list input path + error paths
        status, out2 = _post(base + "/caption", {"image": img.tolist()})
        assert status == 200 and out2["caption"] == cap_out["caption"]
        try:
            _post(base + "/caption", {"image": img[:8].tolist()})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _post(base + "/nope", {"image": b64})
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["caption"]["completed"] >= 2
        assert stats["explain"]["completed"] >= 1
    finally:
        server.shutdown()
        server.server_close()
        for svc in services.values():
            svc.stop()


def test_http_summary_server(tiny_setup):
    """A payload='summary' server serves the default schema and 400s
    include_relevance requests."""
    cap, params, wm, images = tiny_setup
    expl = build_explainer("lrp", cap, params, wm, max_words=6,
                           cnn_word_chunk=0)
    services = {"explain": ExplainService(expl, batch_size=2,
                                          max_delay_s=0.02,
                                          payload="summary").start()}
    server = make_http_server(services, "127.0.0.1", 0)
    warm_services(server, services, background=False)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    img = images[0]
    b64 = {"b64": base64.b64encode(img.tobytes()).decode(),
           "shape": list(img.shape)}
    try:
        status, out = _post(base + "/explain", {"image": b64})
        assert status == 200
        direct = expl.explain_caption_arrays(img[None])
        assert out["caption"] == direct.caption
        assert "relevance_images" not in out
        assert len(out["relevance_stats"]["sum"]) == len(direct.caption)
        try:
            _post(base + "/explain", {"image": b64,
                                      "include_relevance": True})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "payload='summary'" in json.load(e)["error"]
    finally:
        server.shutdown()
        server.server_close()
        services["explain"].stop()


def test_explanation_payload_allheads_shape():
    """The all-heads explainer returns a per-head list; the payload nests."""
    from lrp_imagecaptioning_tpu.explain.explainer import CaptionExplanation

    exp = CaptionExplanation(
        caption=["a"], tokens=np.array([1, 2]),
        relevance_images=np.zeros((1, 4, 4, 3), np.float32),
        relevance_words=np.zeros((1, 2), np.float32),
        alphas=np.zeros((1, 4), np.float32),
        predictions=np.zeros((1, 25), np.float32),
        betas=np.zeros((1,), np.float32))
    out = explanation_payload([exp, exp])
    assert len(out["heads"]) == 2
    assert out["heads"][0]["caption"] == ["a"]


# ----------------------------------------------------- uint8 ingestion ----

def test_caption_service_uint8_matches_f32(tiny_setup):
    """Raw-uint8 requests (device-side normalization) produce the same
    captions as host-normalized float requests; mixed batches coalesce."""
    from lrp_imagecaptioning_tpu.data.dataset import normalize_image

    cap, params, wm, _ = tiny_setup
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, size=(3, 64, 64, 3), dtype=np.uint8)
    f32 = normalize_image(u8)
    svc = CaptionService(cap, params, wm, batch_size=4, decode="greedy",
                         max_delay_s=0.2).start()
    try:
        svc.warmup(dtypes=("float32", "uint8"))
        got_u8 = [svc.submit(u8[i]) for i in range(3)]
        got_u8 = [f.result(timeout=120)["caption"] for f in got_u8]
        got_f32 = [svc.submit(f32[i]) for i in range(3)]
        got_f32 = [f.result(timeout=120)["caption"] for f in got_f32]
        assert got_u8 == got_f32
        # mixed dtype batch: uint8 entries host-normalize into the f32 program
        mixed = [svc.submit(u8[0]), svc.submit(f32[1]), svc.submit(u8[2])]
        mixed = [f.result(timeout=120)["caption"] for f in mixed]
        assert mixed == [got_f32[0], got_f32[1], got_f32[2]]
    finally:
        svc.stop()


def test_http_decode_input_uint8():
    import base64 as b64mod

    from lrp_imagecaptioning_tpu.serving.http_api import decode_input

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    spec = {"b64": b64mod.b64encode(arr.tobytes()).decode(),
            "shape": [4, 4, 3], "dtype": "uint8"}
    out = decode_input(spec)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, arr)
    with pytest.raises(ValueError):
        decode_input({"b64": spec["b64"], "shape": [4, 4, 3],
                      "dtype": "int64"})


def test_explain_summary_packed_matches_unpacked(tiny_setup):
    """packed_transfer ships ONE flat f32 vector per batch; results must be
    byte-identical to the five-leaf transfer (int leaves round-trip
    exactly)."""
    cap, params, wm, images = tiny_setup
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.serving import ExplainService

    expl = build_explainer("lrp", cap, params, wm, max_words=5,
                           cnn_word_chunk=0)
    packed = ExplainService(expl, batch_size=2, payload="summary",
                            packed_transfer=True)
    plain = ExplainService(expl, batch_size=2, payload="summary",
                           packed_transfer=False)
    assert packed.packed_transfer and not plain.packed_transfer
    outs_p = packed._run_batch([images[0], images[1]])
    outs_u = plain._run_batch([images[0], images[1]])
    assert len(outs_p) == len(outs_u) == 2
    for a, b in zip(outs_p, outs_u):
        assert a["caption"] == b["caption"]
        assert a["tokens"] == b["tokens"]
        np.testing.assert_allclose(a["relevance_stats"]["sum"],
                                   b["relevance_stats"]["sum"], rtol=1e-6)
        np.testing.assert_allclose(a["relevance_words"],
                                   b["relevance_words"], rtol=1e-6)
