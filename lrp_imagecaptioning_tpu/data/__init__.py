from .vocab import WordMap, build_word_map, encode_caption
from .dataset import CaptionBatch, CaptionDataset, EvalBatch, toy_dataset
