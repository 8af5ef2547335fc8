from mcseg_tpu.data.datasets import ZipDataset, get_dataset  # noqa: F401
