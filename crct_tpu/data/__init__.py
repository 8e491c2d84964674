"""Input pipeline: tokenization, fig-feature records, example building, batching.

TPU-native replacement of the reference's torch ``PlotQA_Dataset``
(CRCT/fig_dataloader.py) and encoders (CRCT/utils.py:50-225): pure-numpy,
fixed-shape outputs, thread-pooled host pipeline with per-host sharding.
"""

from crct_tpu.data.tokenizer import WordPieceTokenizer
from crct_tpu.data.example_builder import ExampleBuilder
from crct_tpu.data.dataset import ChartQADataset
