from .greedy import greedy_decode, greedy_decode_jit, tokens_to_lists
from .beam import BeamResult, beam_decode, beam_search, best_hypotheses, length_penalty
