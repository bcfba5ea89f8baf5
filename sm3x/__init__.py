"""sm3x — TPU-native SM3: self-supervised multi-modality skin-lesion learning.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference `Dylan-H-Wang/skin-sm3` (see SURVEY.md): a two-stage self-supervised
pipeline (dual-branch contrastive pretraining + DeepCluster multi-label heads)
for the Derm7pt 7-point-checklist dataset, rebuilt TPU-first.

Subpackages
-----------
core      mesh/device setup, precision policy, PRNG discipline, configs
models    Flax ResNet family, SimCLR dual-modal models, projectors, MLC model
ops       fused NT-Xent (XLA + Pallas), on-device augmentation, k-means
losses    NT-Xent / weighted CE / cluster-CE loss APIs
data      Derm7pt metadata layer, dataset wrappers, input pipeline
parallel  mesh + sharding helpers (dp/tp over a named mesh)
train     the four stage loops (backbone_train/eval, mlc_train/eval)
metrics   AUROC/recall/specificity/precision with CLS_WEIGHTS selection
utils     logging, checkpointing (incl. .pth conversion), misc
cli       argparse surface mirroring the reference's get_parser
"""

__version__ = "0.1.0"

# Canonical task constants, shared by every stage.
# Mirrors /root/reference/tools/mlc_eval.py:61-64 and inference.py:8-13.
METRICS_NAME = ["AUC", "Recall", "Spec", "Prec"]
CLASSES_NAME = ["DIAG", "PN", "BWV", "VS", "PIG", "STR", "DaG", "RS"]
NUM_CLASSES = [5, 3, 2, 3, 3, 3, 3, 2]
CLS_WEIGHTS = [2, 2, 1, 2, 2, 2, 2, 1]
CLASSES_NAME_2 = [
    f"{CLASSES_NAME[i]}-{j + 1}"
    for i in range(len(CLASSES_NAME))
    for j in range(NUM_CLASSES[i])
]
