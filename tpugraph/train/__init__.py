from tpugraph.train.losses import margin_align_loss
from tpugraph.train.negatives import sample_uniform_negatives, sample_hard_negatives
from tpugraph.train.eval import hits_at_k
