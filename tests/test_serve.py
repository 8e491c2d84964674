"""HTTP batch-serving tests (crct_tpu/serve.py, beyond-reference).

The reference's serving surface is a one-question-per-turn REPL
(Interactive_demo.py:63-111); these pin the batched server to the demo
engine's answers, the dynamic batcher's coalescing semantics, and the HTTP
API end-to-end on a live ThreadingHTTPServer.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from crct_tpu.config import default_params
from crct_tpu.data.dataset import ChartQADataset
from crct_tpu.data.synthetic import generate_dataset
from crct_tpu.models.crct import CRCTModel
from crct_tpu.serve import DynamicBatcher, QAScorer, QAServer

from tests.helpers import tiny_model_config


@pytest.fixture(scope="module")
def serve_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_env")
    cfg = generate_dataset(str(root / "data"), n_images=8, division=4,
                           n_questions=3, feat_dim=64)
    params = default_params(
        figure_feat_path=cfg["figure_feat_path"],
        qa_parent_dir=cfg["qa_parent_dir"],
        dataset_config={
            "dataset_files_divisions": cfg["dataset_files_divisions"]},
        eval_set="test", eval_batch_size=64,
        save_path=str(root / "results"),
    )
    ds = ChartQADataset(params, "test", init_split="test")
    ds.get_all_answers = True
    model = CRCTModel(
        config=tiny_model_config(vocab_size=30522, v_feature_size=64),
        categories=params["categories"])
    return params, ds, model


@pytest.fixture(scope="module")
def scorer(serve_env):
    params, ds, model = serve_env
    return QAScorer(params, ds, model=model)


def test_batched_score_matches_demo_forward(serve_env, scorer):
    """A batch of questions scored together equals the demo engine scoring
    them one at a time (same jitted eval path, same answers)."""
    params, ds, model = serve_env
    from crct_tpu.cli.demo import PlotQAModel
    qas = ds.qa["test"][:3]
    recs = scorer.score(list(qas), top=3)

    demo = PlotQAModel.__new__(PlotQAModel)
    demo.params, demo.dataset, demo.model = params, ds, model
    from crct_tpu.train.eval_loop import make_eval_step, resolve_eval_chunk
    demo.eval_step = make_eval_step(model)
    demo.chunk = resolve_eval_chunk(params)
    demo.model_params = scorer.model_params

    for qa, rec in zip(qas, recs):
        pred = demo.forward(qa)
        assert rec["cls_output"] == str(pred["cls_output"])
        assert rec["is_reg"] == pred["is_reg"]
        if rec["is_reg"]:
            assert rec["reg_output"] == pytest.approx(pred["reg_output"],
                                                      rel=1e-5)
            assert rec["answer"] == rec["reg_output"]
        else:
            assert rec["answer"] == rec["cls_output"]
        assert 0.0 <= rec["confidence"] <= 1.0
        # top list is rank-ordered and led by the chosen answer
        tops = rec["top"]
        assert len(tops) == 3
        assert tops[0]["answer"] == rec["cls_output"]
        confs = [t["confidence"] for t in tops]
        assert confs == sorted(confs, reverse=True)


def test_dynamic_batcher_coalesces_and_preserves_order():
    """Requests arriving while a dispatch is in flight share the next one;
    results land on the right futures even across coalesced batches."""
    gate = threading.Event()
    calls = []

    def fake_score(pairs, top=0):
        calls.append(len(pairs))
        if len(calls) == 1:
            gate.wait(timeout=10)   # hold the first dispatch open
        return [{"answer": p["question_string"]} for p in pairs]

    b = DynamicBatcher(fake_score, max_batch=8, max_delay_ms=2.0)
    try:
        first = b.submit({"question_string": "q0"})
        while not calls:          # first dispatch is now blocked in-flight
            pass
        rest = [b.submit({"question_string": f"q{i}"}) for i in range(1, 6)]
        gate.set()
        assert first.result(timeout=10) == {"answer": "q0"}
        for i, fut in enumerate(rest, start=1):
            assert fut.result(timeout=10) == {"answer": f"q{i}"}
        # the 5 queued requests were coalesced, not dispatched one-by-one
        assert calls[0] == 1 and len(calls) < 6 and sum(calls) == 6
    finally:
        b.close()


def test_dynamic_batcher_propagates_errors_and_keeps_serving():
    def flaky(pairs, top=0):
        if pairs[0]["question_string"] == "boom":
            raise RuntimeError("scorer exploded")
        return [{"ok": True} for _ in pairs]

    b = DynamicBatcher(flaky, max_batch=1, max_delay_ms=0.0)
    try:
        bad = b.submit({"question_string": "boom"})
        with pytest.raises(RuntimeError, match="scorer exploded"):
            bad.result(timeout=10)
        good = b.submit({"question_string": "fine"})
        assert good.result(timeout=10) == {"ok": True}
    finally:
        b.close()


@pytest.fixture(scope="module")
def live_server(scorer):
    server = QAServer(("127.0.0.1", 0), scorer, max_batch=8,
                      max_delay_ms=2.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", server
    server.shutdown()
    server.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_http_end_to_end(live_server, serve_env):
    base, server = live_server
    params, ds, _ = serve_env

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"

    # figure question listing
    img = int(ds.qa["test"][0]["image_index"])
    with urllib.request.urlopen(
            base + f"/v1/figures/{img}/questions", timeout=30) as resp:
        listing = json.loads(resp.read())
    assert listing["questions"], "figure should list known questions"

    # known question by index == scoring that qa_pair directly
    status, rec = _post(base + "/v1/answer",
                        {"image_index": img, "question_id": 0})
    assert status == 200
    direct = server.scorer.score([server.img_to_qas[img][0]])[0]
    assert rec["cls_output"] == direct["cls_output"]
    assert rec["answer"] == direct["answer"]
    assert "top" not in rec

    # free-form question (the REPL's synthetic qa_pair path)
    status, rec = _post(base + "/v1/answer",
                        {"image_index": img,
                         "question": "is the trend rising ?", "top": 2})
    assert status == 200 and rec["answer"] is not None
    assert len(rec["top"]) == 2

    # batch endpoint answers concurrently-submitted questions
    questions = [{"image_index": int(qa["image_index"]),
                  "question_id": 0} for qa in ds.qa["test"][:3]]
    status, body = _post(base + "/v1/answers", {"questions": questions})
    assert status == 200 and len(body["answers"]) == 3

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["served"] >= 5
    # serving observability: rolling latency percentiles + batching stats
    assert health["latency_ms_p50"] > 0
    assert health["latency_ms_p95"] >= health["latency_ms_p50"]
    assert health["mean_coalesced_batch"] >= 1


def test_cli_flags_build_a_working_server(tmp_path):
    """read_command_line serve flags -> make_server -> live answer, with the
    model built from -model_config like the real CLI."""
    import threading as _threading

    from crct_tpu.config import read_command_line
    from crct_tpu.serve import make_server

    cfg = generate_dataset(str(tmp_path / "data"), n_images=4, division=4,
                           n_questions=2, feat_dim=64)
    tiny = {"vocab_size": 30522, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "v_feature_size": 64, "v_hidden_size": 32,
            "v_num_hidden_layers": 1, "v_num_attention_heads": 2,
            "v_intermediate_size": 32, "bi_hidden_size": 32,
            "bi_num_attention_heads": 4, "v_biattention_id": [0],
            "t_biattention_id": [1], "max_position_embeddings": 512,
            "plotqa_vocab_types": 12, "pooling_method": "mul"}
    with open(tmp_path / "tiny_model.json", "w") as f:
        json.dump(tiny, f)
    cfg.update(model_config=str(tmp_path / "tiny_model.json"),
               main_folder=str(tmp_path) + "/", save_path="results/",
               tensorboard="", checkpoints_dir="results/")
    with open(tmp_path / "ds.json", "w") as f:
        json.dump(cfg, f)

    params = read_command_line(
        ["-qa_file", "qa_pairs.npy", "-dataset_config",
         str(tmp_path / "ds.json"), "-eval_set", "test",
         "-save_name", "srv", "-eval_batch_size", "32",
         "-port", "0", "-serve_max_batch", "4",
         "-serve_max_delay_ms", "1"])
    assert params["serve_max_batch"] == 4
    server = make_server(params, port=0)
    t = _threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        img = next(iter(server.img_to_qas))
        status, rec = _post(base + "/v1/answer",
                            {"image_index": img, "question_id": 0})
        assert status == 200 and rec["answer"] is not None
    finally:
        server.shutdown()
        server.server_close()


def test_serving_shards_over_local_mesh(serve_env, scorer):
    """Serving dispatches shard row-wise across the local device mesh
    (conftest forces 8 virtual CPU devices); answers equal a forced
    single-device scorer's."""
    import jax

    params, ds, model = serve_env
    assert scorer.mesh is not None
    assert scorer.chunk % 8 == 0            # rounded to the device count
    qas = list(ds.qa["test"][:4])
    sharded = scorer.score(qas, top=2)

    single = QAScorer(dict(params), ds, model=model)
    single.mesh = None
    single.chunk = 64
    single.model_params = jax.device_get(scorer.model_params)
    recs = single.score(qas, top=2)
    for a, b in zip(sharded, recs):
        assert a["cls_output"] == b["cls_output"]
        assert a["answer"] == b["answer"] or \
            a["answer"] == pytest.approx(b["answer"], rel=1e-5)
        assert a["confidence"] == pytest.approx(b["confidence"], rel=1e-5)


def test_fast_serving_modes(serve_env):
    """-fast_scorer serving: topk=P rescoring equals the full protocol
    exactly (same selected answers/confidences); fast-only is deterministic
    and shaped like the full path's pred dicts."""
    params, ds, _ = serve_env
    model_fast = CRCTModel(
        config=tiny_model_config(vocab_size=30522, v_feature_size=64),
        categories=params["categories"], fast_scorer=True)
    qas = list(ds.qa["test"][:4])

    ptop = dict(params, fast_scorer=True, fast_scorer_topk=120)
    sc_top = QAScorer(ptop, ds, model=model_fast)
    top_recs = sc_top.score(qas, top=3)

    pfull = dict(params)
    sc_full = QAScorer(pfull, ds, model=model_fast)
    sc_full.model_params = sc_top.model_params   # same weights, full fanout
    full_recs = sc_full.score(qas, top=3)

    for fr, tr in zip(full_recs, top_recs):
        assert tr["cls_output"] == fr["cls_output"]
        assert tr["is_reg"] == fr["is_reg"]
        assert tr["confidence"] == pytest.approx(fr["confidence"], rel=1e-5)
        if fr["is_reg"]:
            assert tr["reg_output"] == pytest.approx(fr["reg_output"],
                                                     rel=1e-5)
        assert tr["top"][0]["answer"] == fr["top"][0]["answer"]

    pfast = dict(params, fast_scorer=True)
    sc_fast = QAScorer(pfast, ds, model=model_fast)
    sc_fast.model_params = sc_top.model_params
    fast_recs = sc_fast.score(qas, top=2)
    fast_recs2 = sc_fast.score(qas, top=2)
    n_q_dispatches = sc_fast.dispatches
    assert fast_recs == fast_recs2               # deterministic
    # ONE question-row dispatch per call at this batch (vs the full path's
    # candidate-row fanout)
    assert n_q_dispatches == 2
    for rec, fr in zip(fast_recs, full_recs):
        assert rec["answer"] is not None
        assert rec["is_reg"] == fr["is_reg"]
        assert 0.0 <= rec["confidence"] <= 1.0
        assert len(rec["top"]) == 2
        confs = [t["confidence"] for t in rec["top"]]
        assert confs == sorted(confs, reverse=True)


def test_serving_matches_predictions_out(tmp_path):
    """The HTTP scorer's pred dicts equal the eval CLI's -predictions_out
    records for the same questions and weights (both init from key(0), so
    no checkpoint is needed) — serving and batch answering are the same
    answers through two surfaces."""
    from crct_tpu.cli.evaluate import main as eval_main
    from crct_tpu.config import read_command_line
    from crct_tpu.data.example_builder import REG_TOKEN

    from tests.helpers import tiny_model_config

    cfg = generate_dataset(str(tmp_path / "data"), n_images=4, division=4,
                           n_questions=3, feat_dim=64)
    tiny = tiny_model_config(vocab_size=30522, num_hidden_layers=2,
                             v_feature_size=64, v_num_hidden_layers=1,
                             v_biattention_id=[0], t_biattention_id=[1],
                             max_position_embeddings=512)
    with open(tmp_path / "tiny_model.json", "w") as f:
        json.dump(dict(tiny.__dict__), f, default=str)
    cfg.update(model_config=str(tmp_path / "tiny_model.json"),
               main_folder=str(tmp_path) + "/", save_path="results/",
               tensorboard="", checkpoints_dir="results/")
    with open(tmp_path / "ds.json", "w") as f:
        json.dump(cfg, f)
    argv = ["-qa_file", "qa_pairs.npy", "-dataset_config",
            str(tmp_path / "ds.json"), "-eval_set", "test",
            "-save_name", "po", "-eval_batch_size", "32",
            "-num_workers", "1",
            "-predictions_out", str(tmp_path / "preds.jsonl")]
    eval_main(argv)
    with open(tmp_path / "preds.jsonl") as f:
        preds = [json.loads(line) for line in f]
    assert len(preds) == 12

    params = read_command_line(argv)
    ds = ChartQADataset(params, "test", init_split="test")
    ds.get_all_answers = True
    scorer = QAScorer(params, ds)
    recs = scorer.score([dict(ds.get_raw(p["question_id"]))
                         for p in preds])
    for p, r in zip(preds, recs):
        assert r["cls_output"] == p["cls_output"]
        assert r["is_reg"] == p["is_reg"]
        if p["confidence"] is not None:
            assert r["confidence"] == pytest.approx(p["confidence"],
                                                    rel=1e-5)
        if p["is_reg"] and p.get("reg_output") is not None:
            assert r["reg_output"] == pytest.approx(p["reg_output"],
                                                    rel=1e-5)
        if r["cls_output"] != REG_TOKEN:
            # (a non-reg question whose argmax is the REG token answers
            # the regression value on the demo/serving surface and the
            # token string in the eval protocol — everything else matches)
            assert str(r["answer"]) == str(p["answer"])


def test_http_error_paths(live_server):
    base, _ = live_server
    for payload, needle in [
            ({}, "image_index"),
            ({"image_index": 0}, "question"),
            ({"image_index": 0, "question_id": 99}, "out of range"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/v1/answer", payload)
        assert err.value.code == 400
        assert needle in json.loads(err.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(base + "/v1/figures/999999/questions",
                               timeout=30)
    assert err.value.code == 404

    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/nope", {})
    assert err.value.code == 404
