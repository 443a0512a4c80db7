from relationalgraphlearning_tpu.models.mlp import MLP, mlp_dims_with_input
from relationalgraphlearning_tpu.models.rgl import RGL
from relationalgraphlearning_tpu.models.value_estimator import ValueEstimator
from relationalgraphlearning_tpu.models.state_predictor import (
    StatePredictor,
    linear_state_predictor,
)
from relationalgraphlearning_tpu.models.mprl_networks import MPRLNetworks
