"""Data pipeline: loaders, preprocessing, scalers (NHWC, numpy-native).

Rebuild of /root/reference/datasets.py. The reference builds tf.data/TFDS
graphs (datasets.py:94-192); this environment is zero-egress with no TFDS, so
the rebuild reads local on-disk formats directly and keeps the same
preprocessing semantics: resize/crop per dataset, optional random flip,
optional uniform dequantization ``(u + 255·x)/256`` (datasets.py:171-173),
values in [0,1] NHWC float32, batches dropped to a multiple of the batch
size. A background prefetch thread overlaps host preprocessing with device
steps (the reference used a private 48-thread tf.data pool,
datasets.py:176-192).

Supported sources (config.data.dataset / config.data.data_dir):
  * CIFAR10  — standard `cifar-10-batches-py` pickle batches
  * SVHN     — `{train,test}_32x32.mat` (scipy.io)
  * NPZ      — any .npz with an `images` uint8 array
  * FOLDER   — a directory of image files (PIL-decodable)
  * TFRECORD — .tfrecords with raw image bytes under 'data'/'image'
               (FFHQ/CelebAHQ layout, datasets.py:110-132)
  * SYNTHETIC (data_dir == '') — deterministic random images, for tests and
    smoke runs
"""
from __future__ import annotations

import itertools
import os
import pickle
import queue
import threading
from typing import Callable, Optional

import numpy as np

Array = np.ndarray


def get_data_scaler(config) -> Callable[[Array], Array]:
  """[0,1] → [−1,1] iff data.centered (reference datasets.py:23-30)."""
  if config.data.centered:
    return lambda x: x * 2.0 - 1.0
  return lambda x: x


def get_data_inverse_scaler(config) -> Callable[[Array], Array]:
  """Inverse of the scaler (reference datasets.py:33-38)."""
  if config.data.centered:
    return lambda x: (x + 1.0) / 2.0
  return lambda x: x


def crop_resize(image: Array, resolution: int) -> Array:
  """Central-crop to square then bicubic resize (reference datasets.py:41-53)."""
  from PIL import Image
  h, w = image.shape[:2]
  crop = min(h, w)
  top, left = (h - crop) // 2, (w - crop) // 2
  image = image[top:top + crop, left:left + crop]
  img = Image.fromarray(image)
  img = img.resize((resolution, resolution), Image.BICUBIC)
  return np.asarray(img)


def resize_small(image: Array, resolution: int) -> Array:
  """Resize preserving aspect so the short side == resolution
  (reference datasets.py:56-63)."""
  from PIL import Image
  h, w = image.shape[:2]
  ratio = resolution / min(h, w)
  img = Image.fromarray(image)
  img = img.resize((int(round(w * ratio)), int(round(h * ratio))),
                   Image.BICUBIC)
  return np.asarray(img)


def central_crop(image: Array, size: int) -> Array:
  """Central crop (reference datasets.py:66-71)."""
  h, w = image.shape[:2]
  top, left = (h - size) // 2, (w - size) // 2
  return image[top:top + size, left:left + size]


# ---------------------------------------------------------------------------
# Raw sources → uint8 NHWC arrays (in-memory) or generators
# ---------------------------------------------------------------------------


def _load_cifar10(data_dir: str, split: str) -> Array:
  base = os.path.join(data_dir, "cifar-10-batches-py")
  files = ([f"data_batch_{i}" for i in range(1, 6)] if split == "train"
           else ["test_batch"])
  arrays = []
  for f in files:
    with open(os.path.join(base, f), "rb") as fh:
      d = pickle.load(fh, encoding="bytes")
    arrays.append(np.asarray(d[b"data"], np.uint8))
  data = np.concatenate(arrays, axis=0)
  return data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NCHW→NHWC


def _load_svhn(data_dir: str, split: str) -> Array:
  import scipy.io
  name = "train_32x32.mat" if split == "train" else "test_32x32.mat"
  mat = scipy.io.loadmat(os.path.join(data_dir, name))
  return np.transpose(mat["X"], (3, 0, 1, 2)).astype(np.uint8)


def _load_npz(data_dir: str, split: str) -> Array:
  path = data_dir if data_dir.endswith(".npz") else os.path.join(
      data_dir, f"{split}.npz")
  with np.load(path) as z:
    key = "images" if "images" in z else list(z.keys())[0]
    return np.asarray(z[key], np.uint8)


def _iter_folder(data_dir: str, resolution: int, resize_op=None):
  from PIL import Image
  exts = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}
  files = sorted(
      os.path.join(r, f)
      for r, _, fs in os.walk(data_dir)
      for f in fs if os.path.splitext(f)[1].lower() in exts)
  if not files:
    raise FileNotFoundError(f"No images under {data_dir}")
  resize_op = resize_op or (lambda img: crop_resize(img, resolution))

  def gen():
    for path in files:
      img = np.asarray(Image.open(path).convert("RGB"))
      yield resize_op(img)

  return gen, len(files)


def _iter_tfrecords(data_dir: str, resolution: int):
  """FFHQ/CelebAHQ-style TFRecords (reference datasets.py:110-132).

  Returns (gen_factory, count_fn): records stream one at a time (never
  materialized), and counting — needed only for exact eval-epoch sizes —
  is a separate raw pass that decodes nothing.
  """
  import tensorflow as tf
  tf.config.set_visible_devices([], "GPU")
  if os.path.isfile(data_dir):  # a single-file tfrecords_path (reference)
    files = [data_dir]
  else:
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(data_dir)
        for f in fs if f.endswith((".tfrecords", ".tfrecord")))
  if not files:
    raise FileNotFoundError(f"No tfrecords under {data_dir}")

  feature_desc = {
      "shape": tf.io.FixedLenFeature([3], tf.int64),
      "data": tf.io.FixedLenFeature([], tf.string),
  }

  def gen():
    ds = tf.data.TFRecordDataset(files)
    for rec in ds:
      ex = tf.io.parse_single_example(rec, feature_desc)
      shape = ex["shape"].numpy()
      img = np.frombuffer(ex["data"].numpy(), np.uint8).reshape(shape)
      img = img.transpose(1, 2, 0)  # CHW → HWC
      if img.shape[0] != resolution:
        img = crop_resize(img, resolution)
      yield img

  def count_fn():
    return sum(1 for _ in tf.data.TFRecordDataset(files))

  return gen, count_fn


class StreamingSource:
  """Bounded-memory image source: a restartable stream of uint8 HWC images.

  Replaces the reference's tf.data graph for large on-disk datasets
  (reference datasets.py:110-132,176-192) — images are decoded lazily, one
  at a time, so 1024px FFHQ never materializes in RAM. ``count`` may be
  None for sources where it is unknown until counted; ``count_fn`` (if
  given) computes it on demand without decoding.
  """

  def __init__(self, gen_factory: Callable, count: Optional[int] = None,
               count_fn: Optional[Callable[[], int]] = None):
    self.gen_factory = gen_factory
    self._count = count
    self._count_fn = count_fn

  @property
  def count(self) -> Optional[int]:
    if self._count is None and self._count_fn is not None:
      self._count = self._count_fn()
    return self._count

  @property
  def count_known(self) -> bool:
    return self._count is not None

  def shard(self, index: int, num_shards: int) -> "StreamingSource":
    """Disjoint strided shard (tf.data ``.shard()`` semantics): this shard
    sees records i with i % num_shards == index."""
    if num_shards == 1:
      return self
    factory = self.gen_factory

    def sharded():
      return itertools.islice(factory(), index, None, num_shards)

    count = self._count
    count_fn = self._count_fn
    return StreamingSource(
        sharded,
        None if count is None else (count - index + num_shards - 1) // num_shards,
        None if count_fn is None
        else lambda: (count_fn() - index + num_shards - 1) // num_shards)

  def materialize(self) -> Array:
    """Decode the whole stream into one uint8 array (small sets / tools)."""
    return np.stack(list(self.gen_factory()))


def shard_for_process(images, process_index: int, process_count: int):
  """Per-host shard of a data source (reference's TPU-pod per-host feeding,
  run_lib.py:122,335 / datasets.py:84-86): disjoint strided shards so no
  two processes ever compute gradients on the same example."""
  if process_count == 1:
    return images
  if isinstance(images, StreamingSource):
    return images.shard(process_index, process_count)
  return images[process_index::process_count]


def materialize(source) -> Array:
  """uint8 array from either an in-memory array or a StreamingSource."""
  if isinstance(source, StreamingSource):
    return source.materialize()
  return source


def _synthetic(config, split: str) -> Array:
  """Deterministic random images for tests / zero-egress smoke runs."""
  n = 512 if split == "train" else 128
  rng = np.random.default_rng(0 if split == "train" else 1)
  size = config.data.image_size
  return rng.integers(0, 256,
                      size=(n, size, size, config.data.num_channels),
                      dtype=np.uint8).astype(np.uint8)


def load_raw_dataset(config, split: str):
  """Resolve config → in-memory uint8 array or bounded-memory StreamingSource.

  Small standard sets (CIFAR10/SVHN/NPZ/synthetic) load in RAM; FOLDER- and
  TFRecord-backed sets stream (the reference streams these through tf.data,
  datasets.py:110-132,176-192 — 1024px FFHQ is ~220 GB decoded and must
  never be materialized). ``config.data.in_memory = True`` forces
  materialization for small folder sets (enables the native C++ loader and
  full-set shuffling).
  """
  name = config.data.dataset.upper()
  # data.tfrecords_path is the reference's key for FFHQ/CelebAHQ records
  # (reference datasets.py:142); honored as a data_dir fallback so reference
  # configs work unchanged.
  data_dir = (config.data.get("data_dir", "")
              or config.data.get("tfrecords_path", ""))
  size = config.data.image_size
  in_memory = config.data.get("in_memory", False)
  if not data_dir:
    return _synthetic(config, split)
  if name == "CIFAR10":
    return _load_cifar10(data_dir, split)
  if name == "SVHN":
    return _load_svhn(data_dir, split)
  if name == "NPZ":
    return _load_npz(data_dir, split)
  if name in ("CELEBA", "LSUN", "FOLDER"):
    # Per-dataset resize chains matching the reference (datasets.py:112-139):
    # CELEBA: central_crop(140) then resize_small; LSUN@128: resize_small
    # then central_crop; otherwise crop_resize.
    if name == "CELEBA":
      resize_op = lambda img: resize_small(central_crop(img, 140), size)
    elif name == "LSUN" and size == 128:
      resize_op = lambda img: central_crop(resize_small(img, size), size)
    else:
      resize_op = lambda img: crop_resize(img, size)
    gen, count = _iter_folder(os.path.join(data_dir, split)
                              if os.path.isdir(os.path.join(data_dir, split))
                              else data_dir, size, resize_op)
    src = StreamingSource(gen, count)
    return src.materialize() if in_memory else src
  if name in ("FFHQ", "CELEBAHQ"):
    gen, count_fn = _iter_tfrecords(data_dir, size)
    src = StreamingSource(gen, count_fn=count_fn)
    return src.materialize() if in_memory else src
  raise NotImplementedError(f"Dataset {name} not supported.")


# ---------------------------------------------------------------------------
# Batching pipeline
# ---------------------------------------------------------------------------


class _Prefetcher:
  """Background-thread prefetch of prepared batches."""

  def __init__(self, make_iter, depth: int = 2):
    self._make_iter = make_iter
    self._q: "queue.Queue" = queue.Queue(maxsize=depth)
    self._thread = threading.Thread(target=self._run, daemon=True)
    self._thread.start()

  def _run(self):
    it = self._make_iter()
    while True:
      self._q.put(next(it))

  def __iter__(self):
    return self

  def __next__(self):
    return self._q.get()


class DatasetIterator:
  """Infinite epoch-shuffled batch iterator over an in-memory uint8 array.

  Yields float32 NHWC batches in [0,1] with the reference's preprocessing:
  optional horizontal flip (train only) and uniform dequantization
  (reference datasets.py:149-174). ``batch_shape`` may add leading axes
  (e.g. ``(n_jitted_steps, batch)``).
  """

  def __init__(self, images: Array, batch_size: int, *,
               random_flip: bool = False,
               uniform_dequantization: bool = False,
               shuffle: bool = True, seed: int = 0,
               prefetch: bool = True):
    assert images.dtype == np.uint8 and images.ndim == 4
    self.images = images
    self.batch_size = batch_size
    self.random_flip = random_flip
    self.uniform_dequantization = uniform_dequantization
    self.shuffle = shuffle
    self.seed = seed
    self.batches_per_epoch = images.shape[0] // batch_size
    src = self._batches
    self._it = _Prefetcher(src) if prefetch else src()

  def _batches(self):
    rng = np.random.default_rng(self.seed)
    n = self.images.shape[0]
    while True:
      order = rng.permutation(n) if self.shuffle else np.arange(n)
      # drop_remainder=True (reference datasets.py:189)
      for start in range(0, n - self.batch_size + 1, self.batch_size):
        idx = order[start:start + self.batch_size]
        batch = self.images[idx].astype(np.float32)
        if self.random_flip:
          flips = rng.random(len(idx)) < 0.5
          batch[flips] = batch[flips, :, ::-1, :]
        if self.uniform_dequantization:
          u = rng.random(batch.shape).astype(np.float32)
          batch = (u + batch) / 256.0
        else:
          batch = batch / 255.0
        yield batch

  def __iter__(self):
    return self

  def __next__(self) -> Array:
    return next(self._it)


class StreamingDatasetIterator:
  """Infinite batch iterator over a StreamingSource with bounded memory.

  Matches the reference tf.data pipeline shape repeat→shuffle(10000)→map→
  batch(drop_remainder)→prefetch (reference datasets.py:176-192): a
  fixed-size reservoir shuffle buffer (capped both by ``shuffle_buffer``
  items and ``buffer_bytes``), per-epoch restart of the underlying stream,
  remainder batches dropped at epoch boundaries, and a background prefetch
  thread. Peak RSS ≈ buffer + a few batches, independent of dataset size.
  """

  def __init__(self, source: StreamingSource, batch_size: int, *,
               random_flip: bool = False,
               uniform_dequantization: bool = False,
               shuffle: bool = True, seed: int = 0,
               shuffle_buffer: int = 10000,
               buffer_bytes: int = 512 << 20,
               prefetch: bool = True):
    self.source = source
    self.batch_size = batch_size
    self.random_flip = random_flip
    self.uniform_dequantization = uniform_dequantization
    self.shuffle = shuffle
    self.seed = seed
    self.shuffle_buffer = shuffle_buffer
    self.buffer_bytes = buffer_bytes
    self._it = _Prefetcher(self._batches) if prefetch else self._batches()

  @property
  def batches_per_epoch(self) -> Optional[int]:
    n = self.source.count  # may trigger a lazy (non-decoding) count pass
    return None if n is None else n // self.batch_size

  def _examples(self, rng):
    """One epoch of examples, reservoir-shuffled under a memory cap."""
    stream = self.source.gen_factory()
    if not self.shuffle:
      yield from stream
      return
    buf = []
    cap = None
    for img in stream:
      if cap is None:
        cap = max(2 * self.batch_size,
                  min(self.shuffle_buffer,
                      self.buffer_bytes // max(img.nbytes, 1)))
      if len(buf) < cap:
        buf.append(img)
        continue
      j = rng.integers(len(buf))
      out, buf[j] = buf[j], img
      yield out
    rng.shuffle(buf)
    yield from buf

  def _batches(self):
    rng = np.random.default_rng(self.seed)
    while True:  # repeat (reference datasets.py:183)
      batch = []
      for img in self._examples(rng):
        batch.append(img)
        if len(batch) < self.batch_size:
          continue
        arr = np.stack(batch).astype(np.float32)
        batch = []
        if self.random_flip:
          flips = rng.random(arr.shape[0]) < 0.5
          arr[flips] = arr[flips, :, ::-1, :]
        if self.uniform_dequantization:
          u = rng.random(arr.shape).astype(np.float32)
          arr = (u + arr) / 256.0
        else:
          arr = arr / 255.0
        yield arr
      # leftover < batch_size dropped: drop_remainder=True semantics

  def __iter__(self):
    return self

  def __next__(self) -> Array:
    return next(self._it)


def _make_iterator(images, batch_size: int, *, random_flip: bool,
                   uniform_dequantization: bool, shuffle: bool, seed: int,
                   backend: str = "auto", prefetch: bool = True):
  """Pick the right producer: streaming for StreamingSource, else the
  native C++ loader when available, numpy otherwise."""
  if isinstance(images, StreamingSource):
    return StreamingDatasetIterator(
        images, batch_size, random_flip=random_flip,
        uniform_dequantization=uniform_dequantization, shuffle=shuffle,
        seed=seed, prefetch=prefetch)
  if backend in ("auto", "native"):
    try:
      from score_sde_pytorch_tpu.native import NativeDataLoader
      return NativeDataLoader(
          images, batch_size, shuffle=shuffle, random_flip=random_flip,
          uniform_dequantization=uniform_dequantization, seed=seed)
    except (ImportError, RuntimeError):
      if backend == "native":
        raise
  return DatasetIterator(
      images, batch_size, random_flip=random_flip,
      uniform_dequantization=uniform_dequantization, shuffle=shuffle,
      seed=seed, prefetch=prefetch)


def get_dataset(config, *, uniform_dequantization: bool = False,
                evaluation: bool = False, process_index: Optional[int] = None,
                process_count: Optional[int] = None):
  """Build (train_iter, eval_iter) (reference datasets.py:71-196).

  ``uniform_dequantization`` overrides the config flag (used by the bpd eval
  pipeline, reference run_lib.py:236). The batch producer is the native C++
  threaded loader when it builds, with a numpy fallback
  (``config.data.loader_backend`` ∈ {auto, native, python}).

  Multi-host: each process gets a disjoint strided shard of the dataset and
  yields LOCAL batches of ``batch_size // process_count`` examples
  (reference datasets.py:84-86 divisibility rule; per-host feeding per
  run_lib.py:122,335). The global batch is assembled in run_lib via
  ``jax.make_array_from_process_local_data``. Pass process_index/count
  explicitly for testing; they default to the live JAX process topology.
  """
  if process_count is None or process_index is None:
    import jax
    process_count = jax.process_count()
    process_index = jax.process_index()
  batch_size = (config.training.batch_size if not evaluation
                else config.eval.batch_size)
  if batch_size % process_count != 0:
    raise ValueError(
        f"batch_size ({batch_size}) must be divisible by the process count "
        f"({process_count}) — reference datasets.py:84-86 semantics.")
  local_batch = batch_size // process_count
  dequant = uniform_dequantization or config.data.uniform_dequantization
  backend = config.data.get("loader_backend", "auto")
  # Decorrelate per-process host RNG (flip/dequant/shuffle order) with a
  # prime stride so adjacent config seeds never collide across hosts.
  seed = config.seed + 7919 * process_index
  train_imgs = shard_for_process(load_raw_dataset(config, "train"),
                                 process_index, process_count)
  eval_imgs = shard_for_process(load_raw_dataset(config, "test"),
                                process_index, process_count)
  train_it = _make_iterator(
      train_imgs, local_batch, random_flip=config.data.random_flip,
      uniform_dequantization=dequant, shuffle=True, seed=seed,
      backend=backend)
  eval_it = _make_iterator(
      eval_imgs, local_batch, random_flip=False,
      uniform_dequantization=dequant, shuffle=False, seed=seed + 1,
      backend="python" if backend == "python" else backend)
  return train_it, eval_it
