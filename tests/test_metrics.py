import numpy as np

from pointunet_tpu.train import (
    binary_dice,
    brats_region_dice,
    confusion_matrix,
    hausdorff95,
    iou_from_confusion,
    mean_iou,
    per_class_dice,
)


def test_confusion_and_iou():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    conf = confusion_matrix(labels, preds, 3)
    assert conf.sum() == 6
    assert conf[0, 0] == 1 and conf[1, 1] == 2 and conf[2, 2] == 1
    iou = iou_from_confusion(conf)
    np.testing.assert_allclose(iou[1], 2 / 3, atol=1e-5)
    assert 0 < mean_iou(labels, preds, 3) < 1


def test_binary_dice():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[:2] = 1
    assert binary_dice(a, b) == 1.0
    assert binary_dice(a, 1 - b) == 0.0
    assert binary_dice(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_per_class_dice():
    truth = np.array([0, 1, 2, 2])
    pred = np.array([0, 1, 2, 1])
    d = per_class_dice(pred, truth, 3)
    assert d[0] == 1.0 and d[2] == 2 * 1 / (1 + 2)


def test_brats_regions():
    truth = np.zeros((6, 6, 6), np.int32)
    truth[1:4, 1:4, 1:4] = 2    # edema
    truth[2:3, 2:3, 2:3] = 4    # enhancing
    pred = truth.copy()
    d = brats_region_dice(pred, truth)
    assert d["WT"] == 1.0 and d["TC"] == 1.0 and d["ET"] == 1.0
    pred[pred == 4] = 1          # ET mispredicted as necrotic
    d = brats_region_dice(pred, truth)
    assert d["WT"] == 1.0 and d["TC"] == 1.0 and d["ET"] == 0.0


def test_hausdorff95():
    a = np.zeros((10, 10, 10), bool)
    b = np.zeros((10, 10, 10), bool)
    a[2:5, 2:5, 2:5] = True
    b[2:5, 2:5, 2:5] = True
    assert hausdorff95(a, b) == 0.0
    b[:] = False
    b[3:6, 2:5, 2:5] = True     # shifted by 1 along axis 0
    assert 0 < hausdorff95(a, b) <= 1.5
    assert hausdorff95(a, np.zeros_like(b)) == float("inf")
    assert hausdorff95(np.zeros_like(a), np.zeros_like(b)) == 0.0
