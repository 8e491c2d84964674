"""CLI front-door tests: the train -> checkpoint -> evaluate roundtrip
through the REAL argparse entry points (reference usage: README.md:69,82).

The verify skill drives these same surfaces on the TPU; this keeps the
full flag->config->loop integration guarded in the default CPU suite.
"""

import json
import os

import numpy as np
import pytest

from crct_tpu.data.synthetic import generate_dataset

TINY_MODEL = {
    "vocab_size": 30522, "hidden_size": 64, "num_hidden_layers": 4,
    "num_attention_heads": 4, "intermediate_size": 128,
    "v_feature_size": 64, "v_hidden_size": 32, "v_num_hidden_layers": 2,
    "v_num_attention_heads": 2, "v_intermediate_size": 32,
    "bi_hidden_size": 32, "bi_num_attention_heads": 4,
    "v_biattention_id": [0, 1], "t_biattention_id": [2, 3],
    "max_position_embeddings": 512, "plotqa_vocab_types": 12,
    "pooling_method": "mul",
}


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_env")
    cfg = generate_dataset(str(root / "data"), n_images=8, division=4,
                           n_questions=4, feat_dim=64)
    with open(root / "tiny_model.json", "w") as f:
        json.dump(TINY_MODEL, f)
    cfg.update(model_config=str(root / "tiny_model.json"),
               main_folder=str(root) + "/", save_path="results/",
               tensorboard="", checkpoints_dir="results/")
    with open(root / "ds.json", "w") as f:
        json.dump(cfg, f)
    return root


def test_train_then_evaluate_cli_roundtrip(cli_env, capsys):
    from crct_tpu.cli.evaluate import main as evaluate_main
    from crct_tpu.cli.train import main as train_main

    cwd = os.getcwd()
    os.chdir(cli_env)
    try:
        train_main(["-qa_file", "qa_pairs.npy", "-dataset_config",
                    str(cli_env / "ds.json"), "-batch_size", "8",
                    "-num_epochs", "1", "-num_workers", "1",
                    "-save_name", "run1", "-no_eval"])
        ckpt = cli_env / "results" / "run1" / "plotqa_encoder_0_8.ckpt"
        assert ckpt.exists()
        out = capsys.readouterr().out
        assert "[Loss:" in out and "Saving model to" in out

        # explicit -eval_batch_size: auto mode would compile a
        # 480x8-row chunk on the 8-device CPU mesh (minutes)
        total, breakdown = evaluate_main(
            ["-qa_file", "qa_pairs.npy", "-dataset_config",
             str(cli_env / "ds.json"), "-eval_set", "test",
             "-save_name", "run1_eval", "-eval_batch_size", "32",
             "-num_workers", "1",
             "-predictions_out", str(cli_env / "preds.jsonl"),
             "-start_checkpoint", str(ckpt)])
        assert total[0, 1] > 0 and np.isfinite(np.asarray(total)).all()
        out = capsys.readouterr().out
        assert "Done evaluation" in out

        # batch answer serving: one JSONL record per evaluated question
        with open(cli_env / "preds.jsonl") as f:
            recs = [json.loads(line) for line in f]
        assert len(recs) == int(total[0, 1])
        for r in recs:
            assert {"question_id", "image_index", "question", "answer",
                    "cls_output", "is_reg", "confidence",
                    "gt_answer"} <= set(r)
            if r["is_reg"]:
                assert "reg_output" in r

        # resume path: completed ids excluded on the second run
        evaluate_main(
            ["-qa_file", "qa_pairs.npy", "-dataset_config",
             str(cli_env / "ds.json"), "-eval_set", "test",
             "-save_name", "run1_eval", "-eval_batch_size", "32",
             "-num_workers", "1",
             "-start_checkpoint", str(ckpt)])
        out = capsys.readouterr().out
        assert "Done Ids:" in out
    finally:
        os.chdir(cwd)


def test_sigterm_preemption_checkpoint(cli_env):
    """Preemption-safe training (beyond-reference): SIGTERM mid-epoch
    saves a resumable checkpoint at the next step boundary and exits
    cleanly; the saved name resumes the interrupted epoch."""
    import signal
    import subprocess
    import sys
    import time

    driver = cli_env / "sigterm_driver.py"
    driver.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from crct_tpu.cli.train import main\n"
        f"main(['-qa_file', 'qa_pairs.npy', '-dataset_config',"
        f" {str(cli_env / 'ds.json')!r}, '-batch_size', '4',"
        " '-num_epochs', '50', '-num_workers', '1',"
        " '-save_name', 'sig', '-no_eval'])\n")
    proc = subprocess.Popen(
        [sys.executable, str(driver)], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "PYTHONPATH":
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
             + ":" + os.environ.get("PYTHONPATH", "")})
    lines = []
    try:
        # first "[Ep:" progress line = the loop is past step 0
        deadline = time.time() + 300
        for line in proc.stdout:
            lines.append(line)
            if "[Ep:" in line:
                break
            assert time.time() < deadline, "".join(lines)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    full = "".join(lines)
    assert proc.returncode == 0, full
    assert "saved preemption checkpoint" in full
    import glob
    from crct_tpu.utils.checkpoint import epoch_from_name, load_checkpoint
    cks = glob.glob(str(cli_env / "results" / "sig" / "*.ckpt"))
    assert len(cks) == 1
    # epoch-1 naming: -continue re-runs the interrupted epoch (epoch 0)
    assert epoch_from_name(cks[0]) + 1 == 0
    assert "model_state_dict" in load_checkpoint(cks[0])
