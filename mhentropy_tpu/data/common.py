"""Batch collation for both array-backed (synthetic) and index-addressable
(HO3D/RHD/FreiHAND) datasets — the framework's DataLoader equivalent.

The reference uses torch DataLoader worker processes
(CrossModalHand.py:176-179); here collation is a thread pool feeding
device-ready numpy batches (double-buffered by the caller iterating while the
device computes), which is the appropriate host-side design for a TPU input
pipeline at this data scale.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# Device-staged batch memo for array-backed datasets, keyed by
# (id(dataset), batch_size).
_DEVICE_BATCH_MEMO: dict = {}


def field_gate(heavy):
    """Membership test for a loader's heavy_fields setting — ONE place
    owns 'None means the full reference-parity target'."""
    return heavy.__contains__ if heavy is not None else (lambda _k: True)


def item_rng(seed: int, epoch: int, idx: int) -> np.random.RandomState:
    """Per-item augmentation RNG: a pure function of (seed, epoch, idx).

    The loaders' former shared per-dataset RandomState made augmentation
    draws depend on thread scheduling (batches() collates from a thread
    pool; numpy RandomState is also documented as not thread-safe), so
    fixed-seed runs were not reproducible. Per-item seeding is both
    thread-safe and order-independent; epoch advances via set_epoch so
    augmentations differ across epochs (the reference's worker seeding
    repeats every epoch — utils.py:68, a documented defect not kept)."""
    return np.random.RandomState(
        np.array([seed & 0x7FFFFFFF, epoch, idx], dtype=np.uint32))


def item_rng_stream(seed: int, epoch: int, idx: int,
                    stream: int) -> np.random.RandomState:
    """A SEPARATE per-item stream (same discipline as item_rng) for
    augmentations added after a loader shipped: drawing from the main
    stream would shift every later draw and silently change all seeded
    items. `stream` is a small constant per augmentation family."""
    return np.random.RandomState(
        np.array([seed & 0x7FFFFFFF, epoch, idx, 0x9E3779B9 ^ stream],
                 dtype=np.uint32))


def _collate(samples):
    """Stack (image, target) pairs — or the RLE datasets' 4-tuples
    (img, target, img_id, bbox) (custom.py:87-102), collated to
    (images, target, img_ids, bboxes) for target_transform's coco/h36m
    branches."""
    images = np.stack([s[0] for s in samples])
    keys = samples[0][1].keys()
    target = {}
    for k in keys:
        vals = [s[1][k] for s in samples]
        if isinstance(vals[0], (str,)):
            continue
        target[k] = np.stack([np.asarray(v) for v in vals])
    if len(samples[0]) == 4:
        ids = np.asarray([s[2] for s in samples])
        bboxes = np.stack([np.asarray(s[3]) for s in samples])
        return images, target, ids, bboxes
    return images, target


def batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    num_workers: int = 4,
    drop_remainder: bool = True,
    to_device: bool = True,
    pad_remainder: bool = False,
):
    """Yield (image, target) jnp batches from either kind of dataset.

    pad_remainder=True keeps tail samples (the reference eval DataLoader has
    no drop_last, CrossModalHand.py:176-179): the final short batch is padded
    to batch_size by wrapping indices and every target carries a 'valid' (B,)
    mask, so the jitted step sees one static shape and metrics can exclude
    the padding.
    """
    if hasattr(dataset, "images"):  # synthetic array container
        if not to_device:
            # Host-side batches without device staging (the generic
            # path's to_device=False contract): numpy slices, same tail
            # semantics as below.
            n = dataset.images.shape[0]
            end = n - batch_size + 1 if (drop_remainder
                                         and not pad_remainder) else n
            for start in range(0, end, batch_size):
                idx = np.arange(start, min(start + batch_size, n))
                k = idx.shape[0]
                if pad_remainder and k < batch_size:
                    idx = np.concatenate(
                        [idx, np.arange(batch_size - k) % n])
                tg = {key: np.asarray(v[idx])
                      for key, v in dataset.targets.items()}
                if pad_remainder:
                    tg["valid"] = (np.arange(batch_size) < k).astype(
                        np.float32)
                yield np.asarray(dataset.images[idx]), tg
            return
        # Stage once on device and memoise: per-step H2D through the axon
        # relay costs ~0.5 s — 20x the step itself (see CLAUDE.md). The memo
        # holds strong references to the keying arrays, so an id can never
        # be recycled by a different live dataset; targets key too (a
        # _replace(targets=...) twin shares the images array).
        key = (id(dataset.images), id(dataset.targets), batch_size,
               pad_remainder, drop_remainder)
        entry = _DEVICE_BATCH_MEMO.get(key)
        if (entry is None or entry[0] is not dataset.images
                or entry[1] is not dataset.targets):
            import jax.numpy as jnp

            from mhentropy_tpu.data import synthetic

            if len(_DEVICE_BATCH_MEMO) > 8:
                _DEVICE_BATCH_MEMO.clear()
            staged = list(synthetic.batches(dataset, batch_size,
                                            pad_remainder))
            n = dataset.images.shape[0]
            tail = n % batch_size
            if not pad_remainder and not drop_remainder and tail:
                # The generic path yields the short tail batch when asked
                # to keep it without padding — mirror that here.
                idx = np.arange(n - tail, n)
                staged.append((
                    jnp.asarray(dataset.images[idx]),
                    {k: jnp.asarray(v[idx])
                     for k, v in dataset.targets.items()},
                ))
            entry = (dataset.images, dataset.targets, staged)
            _DEVICE_BATCH_MEMO[key] = entry
        if shuffle:
            # Inter-epoch mixing without restaging: permute the staged
            # batch ORDER per (seed). Batch composition stays fixed —
            # the acceptable trade for keeping the one-time device
            # staging (per-step H2D costs ~0.5 s through the relay).
            order = np.random.RandomState(seed).permutation(len(entry[2]))
            yield from (entry[2][i] for i in order)
            return
        yield from entry[2]
        return

    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    if pad_remainder:
        drop_remainder = False
    end = n - batch_size + 1 if drop_remainder else n
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, end, batch_size):
            idxs = order[start : start + batch_size]
            k = idxs.shape[0]
            if pad_remainder and k < batch_size:
                idxs = np.concatenate([idxs, order[np.arange(batch_size - k) % n]])
            samples = list(pool.map(dataset.__getitem__, idxs))
            batch = _collate(samples)
            images, target, extras = batch[0], batch[1], batch[2:]
            if pad_remainder:
                target["valid"] = (np.arange(batch_size) < k).astype(np.float32)
            if to_device:
                import jax

                # ONE device_put for the whole batch: per-key jnp.asarray
                # paid a dispatch per target field (~20 of them) — measured
                # 7.5 -> 5.6 ms/batch through the relay for a typical
                # minimal-field batch. (_collate drops string fields, so
                # the tree is all arrays.)
                images, target = jax.device_put((images, target))
            yield (images, target, *extras)


_PIL = None
_GRID_MEMO: dict = {}


def imread(path):
    """Fast image decode — PIL directly. imageio.v2's pillow plugin wraps
    the SAME decoder in ~2 ms/file of plugin-resolution + import machinery
    (profiled via tools/bench_input_pipeline.py: the 3-file RHD sample
    spent 7.4 ms in imageio for ~4.3 ms of actual PNG decode). EXIF
    orientation is honoured like imageio's default.

    When a decode cache is set (`set_decode_cache`), decoded arrays are
    persisted as .npy next to a (mtime, size) stamp and later reads are
    an mmap + copy (~30 us vs ~3-4 ms of PNG decode — the host pipeline
    is decode-bound, docs/PERF.md). In cache mode the result is ALWAYS a
    private writable array (hit and miss paths alike); without a cache
    the PIL-backed array is read-only, as it always was."""
    import os

    if _DECODE_CACHE["dir"] is not None:
        import hashlib
        import threading

        st = os.stat(path)
        key = hashlib.sha1(
            f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}".encode()
        ).hexdigest()
        cpath = os.path.join(_DECODE_CACHE["dir"], key + ".npy")
        try:
            # Hot path: parse the .npy header ONCE per file per process,
            # then plain seek + fromfile (already a private writable
            # array). np.load's per-call open_memmap/header machinery was
            # ~0.2 ms per read x 3 reads/sample (profiled; the read
            # itself is ~30 us). The cache key bakes in (path, mtime,
            # size), so a changed source file lands on a NEW cpath and
            # the memo can never serve a stale header.
            entry = _NPY_HDR_MEMO.get(cpath)
            if entry is None:
                with open(cpath, "rb") as f:
                    version = np.lib.format.read_magic(f)
                    if version == (1, 0):
                        shape, fortran, dtype = \
                            np.lib.format.read_array_header_1_0(f)
                    elif version == (2, 0):
                        shape, fortran, dtype = \
                            np.lib.format.read_array_header_2_0(f)
                    else:
                        raise ValueError(f"npy version {version}")
                    if fortran or dtype.hasobject:
                        raise ValueError("unsupported npy layout")
                    entry = (shape, dtype, f.tell())
                _NPY_HDR_MEMO[cpath] = entry
            shape, dtype, off = entry
            n = int(np.prod(shape, dtype=np.int64))
            with open(cpath, "rb") as f:
                f.seek(off)
                arr = np.fromfile(f, dtype=dtype, count=n)
            if arr.size != n:
                raise ValueError("short read")
            return arr.reshape(shape)
        except (FileNotFoundError, ValueError, OSError):
            pass
        arr = _decode(path)
        from mhentropy_tpu.data.cached import atomic_publish

        # np.save(str) would append .npy — hand it the open fileobj.
        atomic_publish(cpath, lambda fp: np.save(fp, arr))
        return np.array(arr)  # writable copy — same contract as the hit path
    return _decode(path)


def _decode(path):
    global _PIL
    if _PIL is None:
        from PIL import Image, ImageOps

        _PIL = (Image, ImageOps)
    image_mod, ops_mod = _PIL
    with image_mod.open(path) as im:
        im = ops_mod.exif_transpose(im)
        return np.asarray(im)


_DECODE_CACHE = {"dir": None}
_NPY_HDR_MEMO: dict = {}


def set_decode_cache(path: str | None):
    """Enable/disable the decoded-image cache (None disables). The cache
    keys on (abspath, mtime, size), so edited files re-decode. Safe for
    concurrent workers (atomic rename). Pays off from the second epoch
    (or second run — it persists on disk)."""
    import os

    if path is not None:
        os.makedirs(path, exist_ok=True)
    _DECODE_CACHE["dir"] = path


def grid2d(h, w):
    """Cached read-only np.mgrid[0:h, 0:w] — the per-sample mgrid
    allocations were ~3 ms of the 17 ms RHD __getitem__ (profiled)."""
    g = _GRID_MEMO.get((h, w))
    if g is None:
        g = np.mgrid[0:h, 0:w]
        g.setflags(write=False)
        _GRID_MEMO[(h, w)] = g
    return g


class _PrefetchDone:
    pass


def prefetch(iterator, size: int = 2):
    """Run `iterator` in a background thread, keeping up to `size` items
    ready ahead of the consumer.

    The torch-DataLoader-workers equivalent for this pipeline
    (CrossModalHand.py:176-179 uses num_workers=4): jax dispatch is
    already async, so the device overlaps with building the NEXT batch —
    but only until the first host hiccup (a slow decode, a GC pause)
    lands synchronously between steps. A bounded queue decouples host
    jitter from the step cadence; `size` stays small because each slot
    pins a full device-ready batch.

    Exceptions in the producer propagate to the consumer at the point of
    `next()`; abandoning the generator (break / close) stops the producer
    promptly via a poison check on a bounded queue.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, size))
    stop = threading.Event()
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagated to the consumer
            err.append(e)
        finally:
            # Deterministic cleanup of the wrapped generator: an abandoned
            # batches() generator would keep its ThreadPoolExecutor's
            # worker threads alive until GC when the consumer breaks early.
            close = getattr(iterator, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            while not stop.is_set():
                try:
                    q.put(_PrefetchDone, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _PrefetchDone:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
