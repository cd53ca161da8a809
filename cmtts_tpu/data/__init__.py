from cmtts_tpu.data.dataset import FeatureDataset, TextMetaDataset, batch_iterator
