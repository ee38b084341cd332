from .roi_pool import roi_pool, roi_pool_column
from .scatter import scatter_quasi_dense
