from .greedy import greedy_search, sample
from .beam import beam_search
from .diverse import diverse_beam_search
