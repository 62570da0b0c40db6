from online_gp_tpu.data.preprocessing import minmax_scale, zscore, train_test_split, balance_classes
from online_gp_tpu.data.synthetic import sin_cos_dataset, streaming_friedman
from online_gp_tpu.data.banana import banana_dataset
from online_gp_tpu.data.uci import load_uci, UCI_DATASETS
from online_gp_tpu.data.malaria import malaria_dataset
from online_gp_tpu.data.classification_extra import svmguide1_dataset, criteo_dataset

__all__ = [
    "minmax_scale",
    "zscore",
    "train_test_split",
    "balance_classes",
    "sin_cos_dataset",
    "streaming_friedman",
    "banana_dataset",
    "load_uci",
    "UCI_DATASETS",
    "malaria_dataset",
    "svmguide1_dataset",
    "criteo_dataset",
]
