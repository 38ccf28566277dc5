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
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yields (param_name, numpy array) over every checkpoint tensor."""
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


def load_config_json(folder: str) -> dict:
    with open(os.path.join(folder, "config.json")) as f:
        return json.load(f)
