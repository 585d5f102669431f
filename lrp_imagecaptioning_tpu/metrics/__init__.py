from .scores import BLEU, CIDEr, METEOR, ROUGE, SPICE, BERT, Score
from .bleu import corpus_bleu
from .cider import cider_score
from .rouge import rouge_l
from .tokenizer import ptb_tokenize
