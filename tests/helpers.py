"""Shared test helpers: tiny model configs and synthetic dataset params."""

import os

from crct_tpu.config import CRCTModelConfig, default_params
from crct_tpu.data.synthetic import generate_dataset


def tiny_model_config(**kw) -> CRCTModelConfig:
    base = dict(vocab_size=600, hidden_size=64, num_hidden_layers=4,
                num_attention_heads=4, intermediate_size=128,
                v_feature_size=32, v_hidden_size=32, v_num_hidden_layers=2,
                v_num_attention_heads=2, v_intermediate_size=32,
                bi_hidden_size=32, bi_num_attention_heads=4,
                v_biattention_id=[0, 1], t_biattention_id=[2, 3],
                max_position_embeddings=128)
    base.update(kw)
    return CRCTModelConfig(**base)


def synthetic_params(tmp_path, *, n_images=8, division=4, n_questions=4,
                     feat_dim=32, seed=0, task="random", **overrides):
    root = os.path.join(str(tmp_path), "data")
    cfg = generate_dataset(root, n_images=n_images, division=division,
                           n_questions=n_questions, feat_dim=feat_dim,
                           seed=seed, task=task)
    params = default_params(
        figure_feat_path=cfg["figure_feat_path"],
        qa_parent_dir=cfg["qa_parent_dir"],
        dataset_config=cfg,
        max_seq_len=124, max_vis_features=44, categories=228,
        save_path=os.path.join(str(tmp_path), "results"),
    )
    params.update(overrides)
    return params
