"""Inference engine: providers -> layers -> outputs -> sio Labels.

TPU-first port of the reference's new-flow inference architecture
(reference: sleap_nn/inference/predictor.py + layers/ + ops/): model
forwards + peak finding + PAF line scoring run as one jitted XLA program per
batch with static shapes (fixed max peaks, masked), while PAF Hungarian
matching + greedy instance assembly stay host-side behind the same
device/host boundary the reference uses (ScoredBatch, streaming.py:43).
"""

from sleap_nn_tpu.inference.predictor import Predictor
from sleap_nn_tpu.inference.run import predict

__all__ = ["Predictor", "predict"]
