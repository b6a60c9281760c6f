from stutter_tpu.train.metrics import (
    balanced_accuracy,
    classification_metrics,
    confusion_matrix,
)
from stutter_tpu.train.smote import apply_smote_oversampling
from stutter_tpu.train.augment import augment_audio, AugmentConfig
from stutter_tpu.train.heads import (
    HeadConfig,
    init_head_params,
    head_forward,
    StandardScaler,
)
from stutter_tpu.train.classifiers import train_balanced_model, train_improved_models
from stutter_tpu.train.class_weights import compute_class_weights
