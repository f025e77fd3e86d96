from tpugraph.nn.graphconv import GraphConvolution
from tpugraph.nn.highway import Highway
