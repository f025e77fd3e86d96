from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.data.dbp15k import load_dbp15k
from tpugraph.data.openea import load_openea
