"""Online chart ingestion tests (crct_tpu/ingest.py + POST /v1/figures).

The reference only supports the offline composition — extract_features.py
writes shards, then the QA stage loads them.  These pin the ONLINE path:
a PNG arrives over HTTP, the detector + extraction build the record
in-process, and /v1/answer serves questions about it seconds later,
including the fully dataset-free server (-serve_no_dataset).
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crct_tpu.config import default_params
from crct_tpu.detector.mask_rcnn import MaskRCNN
from crct_tpu.detector.synthetic_charts import generate_png_dataset
from crct_tpu.ingest import FigureIngestor, IngestError
from crct_tpu.models.crct import CRCTModel
from crct_tpu.serve import InMemoryFigures, QAScorer, QAServer
from tests.helpers import tiny_model_config

FEAT_DIM = 64
CANVAS = (256, 320)


@pytest.fixture(scope="module")
def png_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ingest_pngs"))
    return generate_png_dataset(root, n_images=2, seed=3, split="test")


@pytest.fixture(scope="module")
def ingestor():
    detector = MaskRCNN(num_classes=16, with_mask=False, fc_dim=FEAT_DIM,
                        post_nms_topk_test=32, depth=14)
    dummy = jnp.zeros((*CANVAS, 3), jnp.float32)
    variables = jax.jit(lambda r: detector.init(r, dummy, train=False))(
        jax.random.key(0))
    return FigureIngestor(detector, variables["params"], dataset="plotqa",
                          canvas=CANVAS, short_edge=0)


@pytest.fixture(scope="module")
def annotations(png_env):
    with open(png_env["annotations"]) as f:
        return json.load(f)


def _load_png(png_env, img_id):
    from PIL import Image
    return Image.open(f"{png_env['png_dir']}/{img_id}.png").convert("RGB")


def test_ingest_matches_offline_extraction(png_env, annotations, ingestor):
    """ingest() reproduces the extract CLI's record byte-for-byte: same
    resize/normalize/pad, same one-trunk-pass detection, same coordinate
    un-scaling and record assembly (cli/extract_features.py)."""
    from crct_tpu.detector.extract import (batched_detect,
                                           build_feature_record,
                                           get_gt_texts, get_nonvis_ids,
                                           inject_img_token,
                                           resize_shortest_edge)

    img = _load_png(png_env, 0)
    rec = ingestor.ingest(img, 0, annotation=annotations[0], ocr_mode="gt")

    # --- the extract CLI's own path, independently jitted ---------------
    detector, det_params = ingestor.detector, ingestor.det_params

    def detect_one(params, image, wh):
        img_box = jnp.stack([jnp.zeros((), jnp.float32),
                             jnp.zeros((), jnp.float32),
                             wh[1], wh[0]])[None, :]
        out = detector.apply({"params": params}, image, img_box,
                             method="detect_with_roi_features")
        img_feat = out.pop("roi_features")
        return out, img_feat[0]

    detect_batch = jax.jit(jax.vmap(detect_one, in_axes=(None, 0, 0)))
    raw = np.asarray(img, np.float32)
    h0, w0 = raw.shape[:2]
    nh, nw = resize_shortest_edge(h0, w0, 0, CANVAS)
    assert (nh, nw) == (h0, w0)         # 240x320 already fits the canvas
    padded = np.zeros((*CANVAS, 3), np.float32)
    padded[:nh, :nw] = (raw - ingestor.pixel_mean) / ingestor.pixel_std
    [(out, img_feat)] = batched_detect(
        detect_batch, det_params, [padded], 1,
        [np.asarray([nh, nw], np.float32)])
    valid = np.asarray(out["valid"])
    feats, classes, boxes = inject_img_token(
        np.asarray(out["features"])[valid],
        np.asarray(out["classes"])[valid],
        np.asarray(out["boxes"])[valid] *
        np.asarray([w0 / nw, h0 / nh, w0 / nw, h0 / nh], np.float32),
        np.asarray(img_feat), (h0, w0))
    _, cls_dict = get_nonvis_ids("plotqa")
    offline = build_feature_record(
        0, feats, classes, boxes, (h0, w0), dataset="plotqa",
        gt_texts=get_gt_texts(annotations[0], cls_dict, "plotqa"),
        ocr_mode="gt")

    assert offline["vis_feat"] is not None
    np.testing.assert_array_equal(rec["vis_feat"], offline["vis_feat"])
    np.testing.assert_array_equal(rec["vis_bbox"], offline["vis_bbox"])
    np.testing.assert_array_equal(rec["class"], offline["class"])
    assert (rec["width"], rec["height"]) == (offline["width"],
                                             offline["height"])
    assert rec["text_feat"].keys() == offline["text_feat"].keys()

    # determinism: same PNG -> identical record
    rec2 = ingestor.ingest(img, 0, annotation=annotations[0], ocr_mode="gt")
    np.testing.assert_array_equal(rec["vis_feat"], rec2["vis_feat"])
    np.testing.assert_array_equal(rec["vis_bbox"], rec2["vis_bbox"])


def test_ingest_resize_path_matches_offline(png_env, annotations, ingestor):
    """With a short-edge target the image is resized before detection and
    boxes are scaled back to ORIGINAL coordinates — byte-identical to the
    extract CLI doing the same (same compiled canvas, so this reuses the
    module's jitted detector)."""
    from PIL import Image
    from crct_tpu.detector.extract import (batched_detect,
                                           build_feature_record,
                                           get_gt_texts, get_nonvis_ids,
                                           inject_img_token, make_detect_one,
                                           resize_shortest_edge)

    resizing = FigureIngestor(ingestor.detector, ingestor.det_params,
                              dataset="plotqa", canvas=CANVAS,
                              short_edge=128)
    img = _load_png(png_env, 1)
    rec = resizing.ingest(img, 1, annotation=annotations[1], ocr_mode="gt")

    raw = np.asarray(img, np.float32)
    h0, w0 = raw.shape[:2]
    nh, nw = resize_shortest_edge(h0, w0, 128, CANVAS)
    assert (nh, nw) != (h0, w0)         # the resize actually happened
    arr = np.asarray(Image.fromarray(raw.astype(np.uint8)).resize(
        (nw, nh), Image.BILINEAR), np.float32)
    padded = np.zeros((*CANVAS, 3), np.float32)
    padded[:nh, :nw] = (arr - resizing.pixel_mean) / resizing.pixel_std
    detect_batch = jax.jit(jax.vmap(make_detect_one(resizing.detector),
                                    in_axes=(None, 0, 0)))
    [(out, img_feat)] = batched_detect(
        detect_batch, resizing.det_params, [padded], 1,
        [np.asarray([nh, nw], np.float32)])
    valid = np.asarray(out["valid"])
    feats, classes, boxes = inject_img_token(
        np.asarray(out["features"])[valid],
        np.asarray(out["classes"])[valid],
        np.asarray(out["boxes"])[valid] *
        np.asarray([w0 / nw, h0 / nh, w0 / nw, h0 / nh], np.float32),
        np.asarray(img_feat), (h0, w0))
    _, cls_dict = get_nonvis_ids("plotqa")
    offline = build_feature_record(
        1, feats, classes, boxes, (h0, w0), dataset="plotqa",
        gt_texts=get_gt_texts(annotations[1], cls_dict, "plotqa"),
        ocr_mode="gt")
    np.testing.assert_array_equal(rec["vis_feat"], offline["vis_feat"])
    np.testing.assert_array_equal(rec["vis_bbox"], offline["vis_bbox"])
    np.testing.assert_array_equal(rec["class"], offline["class"])
    assert (rec["width"], rec["height"]) == (w0, h0)


def test_ingest_rejects_bad_inputs(png_env, annotations, ingestor):
    img = _load_png(png_env, 0)
    with pytest.raises(IngestError, match="annotation"):
        ingestor.ingest(img, 0, ocr_mode="oracle")     # no annotation
    with pytest.raises(IngestError, match="ocr_mode"):
        ingestor.ingest(img, 0, annotation=annotations[0],
                        ocr_mode="bogus")
    with pytest.raises(IngestError, match="RGB"):
        ingestor.ingest(np.zeros((8, 8), np.float32), 0,
                        annotation=annotations[0])
    try:
        import pytesseract  # noqa: F401
    except ImportError:
        # default ocr_mode without an annotation is real OCR
        with pytest.raises(IngestError, match="pytesseract"):
            ingestor.ingest(img, 0)
    with pytest.raises(ValueError, match="multiples of 32"):
        FigureIngestor(ingestor.detector, ingestor.det_params,
                       canvas=(250, 320))


# ---------------------------------------------------------------------------
# dataset-free HTTP server: PNG in, answers out
# ---------------------------------------------------------------------------

def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def live_server(ingestor, tmp_path_factory):
    params = default_params(
        serve_no_dataset=True, eval_set="test", eval_batch_size=64,
        save_path=str(tmp_path_factory.mktemp("serve_results")),
    )
    model = CRCTModel(
        config=tiny_model_config(vocab_size=30522, v_feature_size=FEAT_DIM),
        categories=params["categories"])
    scorer = QAScorer(params, InMemoryFigures(params), model=model)
    server = QAServer(("127.0.0.1", 0), scorer, max_batch=8,
                      max_delay_ms=2.0, ingestor=ingestor)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", server
    server.shutdown()
    server.server_close()


def test_png_to_answer_over_http(live_server, png_env, annotations):
    base, server = live_server

    # ingest is advertised, nothing registered yet
    with urllib.request.urlopen(base + "/v1/figures", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["ingest_enabled"] and body["ingested"] == []

    with open(f"{png_env['png_dir']}/0.png", "rb") as f:
        png64 = base64.b64encode(f.read()).decode()
    status, body = _post(base + "/v1/figures",
                         {"png_base64": png64, "image_id": 777,
                          "annotation": annotations[0], "ocr_mode": "gt"})
    assert status == 200 and body["image_index"] == 777
    assert body["n_elements"] > 0 and body["n_possible_answers"] > 0

    # free-form question against the figure that arrived as a PNG
    status, rec = _post(base + "/v1/answer",
                        {"image_index": 777,
                         "question": "how many bars are there ?", "top": 2})
    assert status == 200 and rec["answer"] is not None
    assert len(rec["top"]) == 2

    # auto-assigned ids live above the dataset id space
    with open(f"{png_env['png_dir']}/1.png", "rb") as f:
        png64b = base64.b64encode(f.read()).decode()
    status, body2 = _post(base + "/v1/figures",
                          {"png_base64": png64b,
                           "annotation": annotations[1], "ocr_mode": "gt"})
    assert status == 200 and body2["image_index"] >= 10 ** 9

    with urllib.request.urlopen(base + "/v1/figures", timeout=30) as resp:
        listing = json.loads(resp.read())
    assert listing["ingested"] == [777, body2["image_index"]]

    # ingested figures carry no known questions
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(base + "/v1/figures/777/questions",
                               timeout=30)
    assert err.value.code == 404


def test_ingest_http_error_paths(live_server, png_env, annotations):
    base, _ = live_server
    for payload, code, needle in [
            ({}, 400, "png_base64"),
            ({"png_base64": "!!!not-base64!!!"}, 400, "base64"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/v1/figures", payload)
        assert err.value.code == code
        assert needle in json.loads(err.value.read())["error"]

    # unknown figure on the answer path -> 404 (no shards to fall back to)
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/v1/answer",
              {"image_index": 12345, "question": "what ?"})
    assert err.value.code == 404

    try:
        import pytesseract  # noqa: F401
    except ImportError:
        # decodes fine but cannot be turned into a record -> 422
        with open(f"{png_env['png_dir']}/0.png", "rb") as f:
            png64 = base64.b64encode(f.read()).decode()
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/v1/figures",
                  {"png_base64": png64, "ocr_mode": "ocr"})
        assert err.value.code == 422

    # malformed client annotation fails AS AN HTTP ERROR, not a dropped
    # connection (extraction runs over client-supplied JSON)
    with open(f"{png_env['png_dir']}/0.png", "rb") as f:
        png64 = base64.b64encode(f.read()).decode()
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/v1/figures",
              {"png_base64": png64, "annotation": "not-a-dict",
               "ocr_mode": "gt"})
    assert err.value.code == 422
    assert "ingestion failed" in json.loads(err.value.read())["error"]

    # a truncated image decodes its header but fails mid-pipeline -> 422
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/v1/figures",
              {"png_base64": base64.b64encode(
                  base64.b64decode(png64)[:200]).decode(),
               "annotation": annotations[0], "ocr_mode": "gt"})
    assert err.value.code in (400, 422)


def test_batch_resilience_and_id_hygiene(live_server, png_env, annotations):
    """One unknown figure id in a coalesced batch must not fail its
    batchmates; auto ids never overwrite claimed ids; ingested records
    are FIFO-capped."""
    base, server = live_server

    # 777 was ingested by the earlier test; 55555 never was
    status, body = _post(base + "/v1/answers", {"questions": [
        {"image_index": 777, "question": "how many bars are there ?"},
        {"image_index": 55555, "question": "what ?"}]})
    assert status == 200
    ok, bad = body["answers"]
    assert ok["answer"] is not None and "error" not in ok
    assert "unknown figure" in bad["error"] and bad["answer"] is None

    # claim the next auto id explicitly, then auto-ingest: no overwrite
    with open(f"{png_env['png_dir']}/1.png", "rb") as f:
        png64 = base64.b64encode(f.read()).decode()
    claimed = server._next_fig_id
    _post(base + "/v1/figures", {"png_base64": png64, "image_id": claimed,
                                 "annotation": annotations[1],
                                 "ocr_mode": "gt"})
    status, body = _post(base + "/v1/figures",
                         {"png_base64": png64,
                          "annotation": annotations[1], "ocr_mode": "gt"})
    assert status == 200 and body["image_index"] > claimed
    assert claimed in server.scorer.figs

    # FIFO eviction caps resident ingested records
    server.scorer.params["serve_max_figures"] = 2
    try:
        oldest = next(iter(server.scorer.figs))
        rec = dict(server.scorer.figs[claimed])
        rec["image_id"] = claimed + 1000
        server.scorer.add_figure(rec)
        assert len(server.scorer.figs) == 2
        assert oldest not in server.scorer.figs
    finally:
        server.scorer.params["serve_max_figures"] = 512
