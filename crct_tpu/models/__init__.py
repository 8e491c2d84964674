"""Model zoo: the CRCT two-stream co-attention QA model and its heads."""

from crct_tpu.models.vilbert import TwoStreamEncoderModel
from crct_tpu.models.crct import CRCTModel, CRCTOutputs
from crct_tpu.models.regressor import HybridRegressor, CERegressor
