from gctplus_tpu.data.dataset import SmilesDataset, BatchLoader, pad_batch
from gctplus_tpu.data.scaler import RobustScaler
from gctplus_tpu.data.toklen import sample_toklens
