"""Word lists for the explanation-quality experiments — data constants from
the reference (evaluation.py:19-44): COCO object categories (+ aliases) and
per-dataset frequent-word lists."""

COCO_CATEGORY = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "hat", "umbrella",
    "shoe", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "kite", "skateboard", "surfboard", "bottle", "plate", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "pizza", "donut", "cake", "chair", "couch", "bed",
    "mirror", "window", "desk", "toilet", "door", "tv", "laptop", "mouse",
    "remote", "keyboard", "microwave", "oven", "toaster", "sink",
    "refrigerator", "blender", "book", "clock", "vase", "scissors",
    "toothbrush",
    "ball", "bat", "glove", "racket", "light", "hydrant", "sign", "meter",
    "glass", "bear", "drier", "brush", "plant", "table", "phone",
]

PERSON = ["people", "woman", "women", "man", "men", "boy", "girl", "player",
          "baby", "person"]
AIRPLANE = ["plane", "jetliner", "jet", "airplane"]
BICYCLE = ["bike", "bicycle"]
CAR = ["car", "taxi"]

OBJECT_WORDS = sorted(set(COCO_CATEGORY + PERSON + AIRPLANE + BICYCLE + CAR))

flickr_frequent = [
    "dogs", "building", "person", "background", "field", "women", "hat",
    "ball", "children", "child", "water", "street", "boy", "dog", "girl",
    "men", "shirt", "people", "woman", "man",
]

coco_frequent = [
    "clock", "kitchen", "picture", "water", "food", "pizza", "grass",
    "building", "bus", "sign", "bathroom", "baseball", "dog", "room", "cat",
    "plate", "train", "field", "tennis", "person", "table", "street",
    "woman", "people", "man",
]


def matches_category(word: str, key: str) -> bool:
    """The reference's plural-stripping category match
    (evaluation.py:120,375-381)."""
    forms = (word, word.rstrip("s"), word.rstrip("es"), word.rstrip("ies") + "y")
    if " " in key:
        parts = key.split(" ")
        return any(f in parts for f in forms)
    return any(f == key for f in forms)


def is_object_word(word: str) -> bool:
    forms = (word, word.rstrip("s"), word.rstrip("es"), word.rstrip("ies") + "y")
    return any(f in OBJECT_WORDS for f in forms)
