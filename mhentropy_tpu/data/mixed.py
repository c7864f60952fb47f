"""Mixed-dataset concatenation ('mixed_ho3d_rhd' in the reference's batch
adapter, dataset_transforms.py:12): round-robin over member datasets with a
shared target contract."""

from __future__ import annotations


class MixedDataset:
    def __init__(self, datasets: list):
        assert datasets
        self.datasets = datasets
        self._bounds = []
        total = 0
        for ds in datasets:
            total += len(ds)
            self._bounds.append(total)

    def __len__(self):
        return self._bounds[-1]

    def __getitem__(self, idx: int):
        prev = 0
        for ds, bound in zip(self.datasets, self._bounds):
            if idx < bound:
                return ds[idx - prev]
            prev = bound
        raise IndexError(idx)


def load(data_dir: str, mode: str = "training", **kw) -> MixedDataset:
    from mhentropy_tpu.data import ho3d, rhd

    return MixedDataset([
        ho3d.load(data_dir, mode=mode, **kw),
        rhd.load(data_dir, mode=mode, **kw),
    ])
