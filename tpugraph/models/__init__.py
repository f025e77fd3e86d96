from tpugraph.models.encoder import AlignGCN
