"""Mixed-dataset concatenation ('mixed_ho3d_rhd' in the reference's batch
adapter, dataset_transforms.py:12 — named there but never given a loader;
this makes it real): concatenation over member datasets with a shared
target contract.

Members produce different target key sets (HO3D carries verts/object
meshes, RHD carries patch/viewRotation/...), and one collated batch needs
one schema — so items are projected onto the INTERSECTION of the member
key sets (computed once from one item per member). Image normalisation
also differs per member (RHD x/255 vs HO3D's [-1,1]); members keep their
own host-side f32 normalisation, so the uint8 transport (whose device
affine is per-sample anyway) is forced off for a consistent collated
dtype.
"""

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
        self._common_keys = None

    def __len__(self):
        return self._bounds[-1]

    def _keys(self):
        if self._common_keys is None:
            key_sets = [set(ds[0][1].keys()) for ds in self.datasets]
            common = set.intersection(*key_sets)
            # 'dataset' (a string) survives projection; _collate drops it.
            self._common_keys = common
        return self._common_keys

    def __getitem__(self, idx: int):
        prev = 0
        for ds, bound in zip(self.datasets, self._bounds):
            if idx < bound:
                image, target = ds[idx - prev]
                keys = self._keys()
                return image, {k: v for k, v in target.items() if k in keys}
            prev = bound
        raise IndexError(idx)


def load(data_dir: str, mode: str = "training", **kw) -> MixedDataset:
    from mhentropy_tpu.data import ho3d, rhd

    # Force a uniform f32 image contract: RHD would otherwise emit u8
    # while HO3D training emits f32, and one batch cannot mix them.
    kw = dict(kw, image_u8=False)
    return MixedDataset([
        ho3d.load(data_dir, mode=mode, **kw),
        rhd.load(data_dir, mode=mode, **kw),
    ])
