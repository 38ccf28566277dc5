"""Checkpoint weight iteration.

Capability parity: /root/reference/vllm/model_executor/weight_utils.py
— hf_model_weights_iterator (file-locked snapshot download + .bin
iteration, :20-75) and dummy-weight init (:105-119; implemented per
model as init_dummy_params). Re-designed: prefers safetensors (zero-
copy numpy), supports local directories first-class (this deployment
is egress-free), torch .bin as fallback.
"""

import glob
import json
import os
from typing import Iterator, Tuple

import numpy as np

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def _resolve_model_dir(model_name_or_path: str, download_dir=None) -> str:
    if os.path.isdir(model_name_or_path):
        return model_name_or_path
    # Hub path: download (requires network; file-locked like the
    # reference so concurrent engine starts don't race).
    from filelock import FileLock
    from huggingface_hub import snapshot_download
    lock_dir = download_dir or "/tmp/vllm_tpu_locks"
    os.makedirs(lock_dir, exist_ok=True)
    lock = FileLock(
        os.path.join(lock_dir,
                     model_name_or_path.replace("/", "--") + ".lock"))
    with lock:
        return snapshot_download(model_name_or_path,
                                 cache_dir=download_dir,
                                 allow_patterns=["*.safetensors", "*.bin",
                                                 "*.json", "*.model"])


def hf_weights_iterator(
    model_name_or_path: str,
    download_dir=None,
    use_np_cache: bool = False,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yields (param_name, numpy array) over every checkpoint tensor.

    ``use_np_cache`` (parity: reference weight_utils.py:44-70) converts
    torch ``.bin`` checkpoints once into per-tensor ``.npy`` files and
    mmap-loads those on later starts — torch unpickling is the slow
    part. Safetensors checkpoints are already zero-copy, so the flag is
    a no-op for them.
    """
    folder = _resolve_model_dir(model_name_or_path, download_dir)
    st_files = sorted(glob.glob(os.path.join(folder, "*.safetensors")))
    bin_files = sorted(glob.glob(os.path.join(folder, "*.bin")))
    # Exclude torch index jsons masquerading via glob on .bin? (.bin glob
    # only matches weights; index files are .json)
    if st_files:
        from safetensors import safe_open
        for path in st_files:
            logger.info("Loading weights from %s", os.path.basename(path))
            with safe_open(path, framework="np") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
    elif bin_files:
        if use_np_cache:
            yield from _np_cached_bin_iterator(folder, bin_files)
            return
        import torch
        for path in bin_files:
            logger.info("Loading weights from %s", os.path.basename(path))
            state = torch.load(path, map_location="cpu", weights_only=True)
            for name, tensor in state.items():
                yield name, tensor.to(torch.float32).numpy()
            del state
    else:
        raise FileNotFoundError(
            f"No *.safetensors or *.bin checkpoints under {folder}")


def _np_cached_bin_iterator(
        folder: str, bin_files) -> Iterator[Tuple[str, np.ndarray]]:
    """Build (once, file-locked) then mmap-read an .npy cache of torch
    .bin checkpoints."""
    from filelock import FileLock
    np_dir = os.path.join(folder, "np")
    index_path = os.path.join(np_dir, "weight_names.json")
    os.makedirs(np_dir, exist_ok=True)
    with FileLock(os.path.join(np_dir, "convert.lock")):
        if not os.path.exists(index_path):
            import torch
            names = []
            for path in bin_files:
                logger.info("Converting %s to np cache",
                            os.path.basename(path))
                state = torch.load(path, map_location="cpu",
                                   weights_only=True)
                for name, tensor in state.items():
                    arr = tensor.to(torch.float32).numpy()
                    np.save(os.path.join(np_dir,
                                         name.replace("/", "--") + ".npy"),
                            arr)
                    names.append(name)
                del state
            with open(index_path, "w") as f:
                json.dump(names, f)
    with open(index_path) as f:
        names = json.load(f)
    for name in names:
        path = os.path.join(np_dir, name.replace("/", "--") + ".npy")
        yield name, np.load(path, mmap_mode="r")


def load_config_json(folder: str) -> dict:
    with open(os.path.join(folder, "config.json")) as f:
        return json.load(f)
