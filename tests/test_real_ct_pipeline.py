"""Real-CT segmentation data pipeline (TotalSegmentator ingestion) on
synthetic fixtures — no patient data ships with either repo, so the
pipeline is exercised end to end on generated mask folders
(reference: preprocess_total_segmentator_dataset.py, merge_segmentations.py,
segmentation/utils.py:69-135, dataset.py:78-273)."""

from pathlib import Path

import numpy as np
import pytest

from cbctmc_tpu.models.real_ct import (
    PickleDataset,
    load_training_volumes,
    merge_total_segmentator_folder,
    preprocess_case,
)
from cbctmc_tpu.models.segmentation import LABELS, N_LABELS
from cbctmc_tpu.utils.io import write_image


def _make_case(folder: Path, shape=(24, 20, 16), spacing=(2.0, 2.0, 2.0)):
    """Fake TotalSegmentator export: body ellipse, two ribs + a vertebra,
    a muscle, a lung with vessels, a liver."""
    folder.mkdir(parents=True, exist_ok=True)
    x, y, z = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    cx, cy, cz = [s / 2 for s in shape]

    body = ((x - cx) / 10) ** 2 + ((y - cy) / 8) ** 2 < 1.0
    rib1 = body & (np.abs(x - 4) < 1.5) & (y < cy)
    rib2 = body & (np.abs(x - 20) < 1.5) & (y < cy)
    vert = body & (np.abs(x - cx) < 2) & (np.abs(y - 3) < 2)
    muscle = body & (np.abs(y - (cy + 5)) < 1.5)
    lung = body & (((x - cx + 4) / 3) ** 2 + ((y - cy) / 3) ** 2 < 1.0)
    vessels = lung & (np.abs(x - (cx - 4)) < 1)
    liver = body & (((x - cx - 5) / 2.5) ** 2 + ((y - cy) / 2.5) ** 2 < 1.0) & ~lung

    masks = {
        "body.nii.gz": body,
        "rib_left_1.nii.gz": rib1,
        "rib_right_1.nii.gz": rib2,
        "vertebrae_T5.nii.gz": vert,
        "autochthon_left.nii.gz": muscle,
        "lung_upper_lobe_left.nii.gz": lung,
        "lung_vessels.nii.gz": vessels,
        "liver.nii.gz": liver,
    }
    for name, mask in masks.items():
        write_image(mask.astype(np.uint8), folder / name, spacing=spacing)

    image = np.full(shape, -1000.0, np.float32)
    image[body] = 40.0
    image[lung] = -750.0
    image[rib1 | rib2 | vert] = 400.0
    return image, masks


def test_merge_total_segmentator_folder(tmp_path):
    image, masks = _make_case(tmp_path / "seg")
    stack = merge_total_segmentator_folder(tmp_path / "seg")
    assert stack.shape == (N_LABELS, 24, 20, 16)

    name_to_idx = {v: k for k, v in LABELS.items()}
    body = masks["body.nii.gz"]
    # background is exactly the complement of the body
    np.testing.assert_array_equal(stack[name_to_idx["background"]], ~body)
    # bones are the union of the rib/vertebra families
    bones = (
        masks["rib_left_1.nii.gz"]
        | masks["rib_right_1.nii.gz"]
        | masks["vertebrae_T5.nii.gz"]
    )
    np.testing.assert_array_equal(stack[name_to_idx["upper_body_bones"]], bones)
    # "other" fills the body outside every organ class
    other = stack[name_to_idx["other"]].astype(bool)
    assert not (other & ~body).any()
    assert not (other & bones).any()
    assert not (other & masks["lung_upper_lobe_left.nii.gz"]).any()
    assert other.any()
    # every voxel carries at least one softmax-group label (organ masks MAY
    # overlap — e.g. a rib crossing the liver ellipse here — exactly as the
    # reference's merge_mc_segmentations leaves them; lung_vessels ride on
    # the separate sigmoid channel)
    softmax = stack[:8].sum(axis=0)
    assert softmax.min() >= 1
    # background and "other" never overlap an organ
    organs = stack[1:7].any(axis=0)
    assert not (stack[name_to_idx["background"]].astype(bool) & organs).any()
    assert not (other & organs).any()
    # missing structures (stomach, fat) resolve to empty channels
    assert stack[name_to_idx["stomach"]].sum() == 0


def test_preprocess_and_pickle_dataset(tmp_path):
    image, _ = _make_case(tmp_path / "seg", spacing=(2.0, 2.0, 2.0))
    write_image(image, tmp_path / "ct.nii.gz", spacing=(2.0, 2.0, 2.0))

    out = preprocess_case(
        tmp_path / "ct.nii.gz", tmp_path / "seg",
        tmp_path / "compiled" / "case_000.pkl.gz",
        target_spacing=(1.0, 1.0, 1.0),
    )
    ds = PickleDataset.from_folder(tmp_path / "compiled")
    assert len(ds) == 1 and out.exists()
    case = ds[0]
    # 2 mm -> 1 mm doubles every axis
    assert case["image"].shape == (48, 40, 32)
    assert case["labels"].shape == (N_LABELS, 48, 40, 32)
    assert case["image_spacing"] == (1.0, 1.0, 1.0)
    # labels stay one-hot binary after nearest-neighbour resampling
    assert set(np.unique(case["labels"])) <= {0, 1}
    assert case["labels"][:8].sum(axis=0).min() >= 1

    # the compiled case feeds the training pipeline
    from cbctmc_tpu.models.datasets import SegmentationPatchDataset

    images, labels = load_training_volumes(ds)
    dataset = SegmentationPatchDataset(
        images=images, labels=labels, patch_shape=(16, 16, 16), batch_size=2
    )
    batch = next(iter(dataset))
    assert batch["input"].shape[0] == 2
    assert batch["target"].shape[-1] == N_LABELS
    assert np.isfinite(batch["input"]).all()


def test_preprocess_rejects_shape_mismatch(tmp_path):
    image, _ = _make_case(tmp_path / "seg")
    write_image(image[:-2], tmp_path / "ct.nii.gz", spacing=(2.0, 2.0, 2.0))
    with pytest.raises(ValueError):
        preprocess_case(
            tmp_path / "ct.nii.gz", tmp_path / "seg",
            tmp_path / "case.pkl.gz",
        )
