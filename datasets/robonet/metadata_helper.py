"""RoboNet hdf5 metadata scanner (host tool, no pandas dependency).

Rebuild of reference datasets/robonet/metadata_helper.py:17-189 (itself
credited to SudeepDasari/RoboNet). One metadata dict per hdf5 file (sha256,
state/action/img shapes, encoding, bounds, misc/metadata attrs), cached as a
pickle next to the data; a thin container offers per-file lookup.
"""

from __future__ import annotations

import glob
import hashlib
import io
import os
import pickle
from multiprocessing import Pool, cpu_count
from typing import Dict, List, Union


def load_metadata_dict(fname: str) -> Dict:
    import h5py
    if not os.path.isfile(fname):
        raise IOError(f"can't find {fname}")
    with open(fname, "rb") as f:
        buf = f.read()

    md: Dict = {"sha256": hashlib.sha256(buf).hexdigest()}
    with h5py.File(io.BytesIO(buf)) as hf:
        md["file_version"] = hf["file_version"][()]
        md["sdim"] = hf["env"]["state"].shape[1]
        md["state_T"] = hf["env"]["state"].shape[0]
        md["adim"] = hf["policy"]["actions"].shape[1]
        md["action_T"] = hf["policy"]["actions"].shape[0]

        n_cams = hf["env"].attrs.get("n_cams", 0)
        if n_cams:
            md["ncam"] = n_cams
            if hf["env"].attrs["cam_encoding"] == "mp4":
                frames = hf["env"]["cam0_video"]["frames"]
                md["frame_dim"] = frames.attrs["shape"][:2]
                md["img_T"] = frames.attrs["T"]
                md["img_encoding"] = "mp4"
                md["image_format"] = frames.attrs["image_format"]
            else:
                frame0 = hf["env"]["cam0_video"]["frame0"]
                md["frame_dim"] = frame0.attrs["shape"][:2]
                md["image_format"] = frame0.attrs["image_format"]
                md["img_encoding"] = "jpg"
                md["img_T"] = len(hf["env"]["cam0_video"])

        for k in hf["misc"].keys():
            assert k not in md, f"key {k} already present!"
            md[k] = hf["misc"][k][()]
        for k in hf["metadata"].attrs.keys():
            assert k not in md, f"key {k} already present!"
            md[k] = hf["metadata"].attrs[k]
        if "low_bound" not in md and "low_bound" in hf["env"]:
            md["low_bound"] = hf["env"]["low_bound"][0]
        if "high_bound" not in md and "high_bound" in hf["env"]:
            md["high_bound"] = hf["env"]["high_bound"][0]
    return md


class MetaDataContainer:
    def __init__(self, base_path: str, frame: Dict[str, Dict]):
        self._base_path = base_path
        self._frame = frame  # filename -> metadata dict

    def get_file_metadata(self, fname: str) -> Dict:
        return self._frame[os.path.basename(fname)]

    @property
    def frame(self):
        return self._frame

    @property
    def files(self) -> List[str]:
        return [os.path.join(self._base_path, f) for f in sorted(self._frame)]

    def __len__(self):
        return len(self._frame)

    def __contains__(self, item):
        return item in self._frame


def _scan(files: List[str]) -> Dict[str, Dict]:
    with Pool(min(cpu_count(), 16)) as p:
        dicts = p.map(load_metadata_dict, files)
    return {os.path.basename(f): d for f, d in zip(files, dicts)}


def load_metadata(path_or_files: Union[str, List[str]]) -> MetaDataContainer:
    """Directory path (cached as meta_data_ivg.pkl) or explicit file list."""
    if isinstance(path_or_files, (list, tuple)):
        return MetaDataContainer("", _scan(sorted(path_or_files)))

    base = os.path.expanduser(path_or_files)
    if os.path.isdir(base):
        files = sorted(glob.glob(os.path.join(base, "*.hdf5")))
        cache = os.path.join(base, "meta_data_ivg.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                frame = pickle.load(f)
            if set(frame) == {os.path.basename(x) for x in files}:
                return MetaDataContainer(base, frame)
            os.remove(cache)
        frame = _scan(files)
        with open(cache, "wb") as f:
            pickle.dump(frame, f)
        return MetaDataContainer(base, frame)

    # single file
    return MetaDataContainer(os.path.dirname(base), _scan([base]))
