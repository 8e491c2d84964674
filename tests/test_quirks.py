"""Reference-quirk tests: _REGS/_cls qa files, fixed_vocab, BOT_MODE,
JSON QA loading, split paths."""

import json

import numpy as np
import pytest

from crct_tpu.config import default_params, read_command_line
from crct_tpu.data.dataset import ChartQADataset
from crct_tpu.data.example_builder import REG_TOKEN, ExampleBuilder
from crct_tpu.data.tokenizer import WordPieceTokenizer
from crct_tpu.data.synthetic import generate_dataset, make_fig_feat


def _fig():
    return make_fig_feat(0, np.random.default_rng(0), feat_dim=16)


def _qa(answer, qid="D7"):
    return {"question_string": "what is the value ?", "answer": answer,
            "qid": qid, "type": "vbar", "image_index": 0}


def test_regs_qa_file_restricts_candidates():
    """'_REGS' qa files evaluate regression-only: candidates are [<r>, <r>]
    and the GT index is forced to the first (fig_dataloader.py:551-552,591)."""
    params = default_params(qa_file="qa_pairs_REGS.npy", max_seq_len=124,
                            max_vis_features=44)
    b = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    item = b.build(_fig(), _qa(42.5), split="val", get_all_answers=True,
                   rng=np.random.default_rng(0))
    assert int(item["num_ans"][0]) == 2
    assert item["needs_reg"][0]


def test_cls_qa_file_disables_regression():
    """'_cls' qa files never take the regression branch
    (fig_dataloader.py:604): unmatched answers get a random gt_ind."""
    params = default_params(qa_file="qa_pairs_cls.npy", max_seq_len=124,
                            max_vis_features=44)
    b = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    item = b.build(_fig(), _qa(42.5), split="train",
                   rng=np.random.default_rng(0))
    assert not item["needs_reg"][0]
    assert np.all(item["R"] == 0)


def test_cls_qa_file_ticks_become_answers():
    """With '_cls' in the qa file, y-tick texts also join possible answers
    (fig_dataloader.py:213-215)."""
    params_plain = default_params(max_seq_len=124, max_vis_features=44)
    params_cls = default_params(qa_file="qa_cls.npy", max_seq_len=124,
                                max_vis_features=44)
    fig = _fig()
    tok = WordPieceTokenizer.synthetic()
    n_plain = len(ExampleBuilder(params_plain, tok).get_possible_answers(fig))
    n_cls = len(ExampleBuilder(params_cls, tok).get_possible_answers(fig))
    assert n_cls > n_plain


def test_fixed_vocab_flag_uses_only_fixed_vocab():
    params = default_params(fixed_vocab=True, max_seq_len=124,
                            max_vis_features=44)
    b = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    item = b.build(_fig(), _qa("Yes", qid="S1"), split="val",
                   get_all_answers=True, rng=np.random.default_rng(0))
    assert int(item["num_ans"][0]) == len(b.fixed_vocab)
    # fixed_vocab eval skips the 120-candidate padding
    assert item["tokens"].shape[0] == len(b.fixed_vocab)


def test_bot_mode_free_form_question():
    """BOT_MODE with answer=None takes the regression path with gt_value 1
    (fig_dataloader.py:613-614)."""
    params = default_params(BOT_MODE=True, max_seq_len=124,
                            max_vis_features=44)
    b = ExampleBuilder(params, WordPieceTokenizer.synthetic())
    qa = {"question_string": "is this rising ?", "answer": None,
          "qid": None, "type": "dot", "image_index": 0}
    item = b.build(_fig(), qa, split="test", get_all_answers=True,
                   rng=np.random.default_rng(0))
    # eval mode pads per-candidate keys to [120, ...]
    assert item["needs_reg"].reshape(-1)[0]
    assert item["R"].reshape(-1, 4)[0, 0] == 1.0


def test_json_qa_file_loading(tmp_path):
    cfg = generate_dataset(str(tmp_path / "d"), n_images=4, division=4,
                           n_questions=2, feat_dim=16)
    # write the same QA pairs as JSON under a qa_pairs wrapper
    qa = np.load(str(tmp_path / "d" / "QA" / "train" / "qa_pairs.npy"),
                 allow_pickle=True)
    json_path = tmp_path / "d" / "QA" / "train" / "qa.json"
    json_path.write_text(json.dumps({"qa_pairs": list(qa)}, default=str))
    params = default_params(
        figure_feat_path=cfg["figure_feat_path"],
        qa_parent_dir=cfg["qa_parent_dir"], qa_file="qa.json",
        dataset_config=cfg)
    ds = ChartQADataset(params, ["train"])
    assert ds.orig_len() == len(qa)


def test_split_path_mapping():
    params = default_params(splits=["train1", "validation1", "validation2"],
                            dataset_config={"dataset_files_divisions": {}})
    from crct_tpu.data.dataset import ChartQADataset
    ds = ChartQADataset.__new__(ChartQADataset)
    ds.params = params
    assert ds.split_path("train") == "train1"
    assert ds.split_path("val") == "validation1"
    assert ds.split_path("test") == "validation2"


def test_cli_config_json_overrides_flags(tmp_path):
    cfg = {"name": "t", "dataset": "plotqa", "categories": 228,
           "max_vis_features": 44, "max_seq_len": 124,
           "binary_answers": False, "main_folder": str(tmp_path) + "/",
           "model_config": "m.json", "save_path": "results/",
           "figure_feat_path": "ff/", "qa_parent_dir": "qa/",
           "tensorboard": "tb/", "checkpoints_dir": "ck/",
           "dataset_files_divisions": {"train": 1},
           "splits": ["train", "val", "test"],
           "batch_size": 123}
    p = tmp_path / "ds.json"
    p.write_text(json.dumps(cfg))
    params = read_command_line(["-qa_file", "q.npy", "-dataset_config",
                                str(p), "-batch_size", "7",
                                "-save_name", "x"])
    # JSON overrides the CLI (reference options.py:93-95)
    assert params["batch_size"] == 123
    # paths absolutized against main_folder
    assert params["figure_feat_path"].startswith(str(tmp_path))
    assert params["save_path"].endswith("results/x")


def test_ddp_seed_from_dist_url(tmp_path):
    params = read_command_line(["-qa_file", "q.npy", "-ddp",
                                "-dist_url", "file:///tmp/DDP_TEMP_FILE_777",
                                "-save_name", "x"])
    assert params["seed"] == 777


def test_fixed_vocab_eval_end_to_end(tmp_path):
    """The eval engine handles the fixed-vocab fan-out (constant num_ans,
    no 120-candidate padding)."""
    import jax
    from crct_tpu.data.dataset import DataLoader
    from crct_tpu.models.crct import CRCTModel
    from crct_tpu.train.eval_loop import evaluate
    from crct_tpu.train.train_loop import device_batch
    from tests.helpers import synthetic_params, tiny_model_config
    params = synthetic_params(tmp_path, n_images=4, division=4,
                              n_questions=2, feat_dim=32, fixed_vocab=True,
                              eval_batch_size=64)
    ds = ChartQADataset(params, ["val"], init_split="val")
    ds.get_all_answers = True
    item = ds[0]
    n_vocab = len(ds.builder.fixed_vocab)
    assert item["tokens"].shape[0] == n_vocab
    cfg = tiny_model_config(v_feature_size=32)
    model = CRCTModel(config=cfg, categories=params["categories"])
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    from crct_tpu.train.eval_loop import _chunk_rows, _flatten_valid_rows
    sample = next(iter(loader))
    rows, offsets = _flatten_valid_rows(sample)
    assert offsets[-1] == 2 * n_vocab
    chunked, _ = next(_chunk_rows(rows, 64))
    variables = model.init({"params": jax.random.key(0)},
                           device_batch(chunked), train=False)
    total, _, _ = evaluate(loader, ds, params, model, variables["params"],
                           csv=False)
    assert total[0, 1] == len(ds)
