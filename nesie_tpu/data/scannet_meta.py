"""ScanNet detection metadata (factual constants; reference
configs/Nesie/nesie-votenet-scannet-train-010.py:155-174 and
mmdet3d/datasets/scannet_dataset.py)."""

CLASS_NAMES = (
    "cabinet", "bed", "chair", "sofa", "table", "door", "window",
    "bookshelf", "picture", "counter", "desk", "curtain", "refrigerator",
    "showercurtrain", "toilet", "sink", "bathtub", "garbagebin",
)
NUM_CLASSES = len(CLASS_NAMES)

# nyu40 ids of the 18 detection classes, in class order
VALID_CAT_IDS = (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39)
MAX_CAT_ID = 40

CAT_ID_TO_CLASS = {cid: i for i, cid in enumerate(VALID_CAT_IDS)}

NUM_POINTS = 40000
MAX_GT = 64
