"""Built-in template-matching OCR (crct_tpu/detector/ocr_lite.py).

Closes the last environment-gated link of the real-OCR mode (SURVEY.md
D5): without the Tesseract binary the `--OCR` path previously could not
execute at all. ocr_lite decodes PIL-default-font chart text exactly, so
apply_ocr's dilation/rotation/cleanup now runs end to end against a real
(noisy-capable) engine instead of only a stub.
"""

import sys

import numpy as np
import pytest
from PIL import Image, ImageDraw

sys.path.insert(0, "/root/repo")

from crct_tpu.detector.ocr_lite import image_to_string  # noqa: E402


def render(s, pad=3, canvas_h=20):
    meas = ImageDraw.Draw(Image.new("L", (1, 1)))
    w = int(meas.textlength(s)) + 2 * pad
    img = Image.new("RGB", (w, canvas_h), (255, 255, 255))
    ImageDraw.Draw(img).text((pad, pad), s, fill=(0, 0, 0))
    return np.asarray(img)


def test_exact_decode_of_chart_strings():
    """Representative chart text — numbers, percents, negatives, words,
    punctuation — decodes exactly (same font as synthetic charts)."""
    cases = ["2016", "0.5", "-12,000", "10,000.75", "3.5%", "100", "0.01",
             "52.7", "1e9", "peru", "Brazil", "India", "United States",
             "Revenue (millions)", "female labor force", "money spent",
             "Age (years)", "GDP growth: 3.2%", "What is the avg of x?",
             "Number of tourists", "cadet blue"]
    for text in cases:
        assert image_to_string(render(text)) == text


def test_edge_inputs():
    assert image_to_string(np.full((12, 30, 3), 255, np.uint8)) == ""
    assert image_to_string(np.zeros((0, 0, 3), np.uint8)) == ""
    # grayscale and float inputs work too
    g = np.asarray(Image.fromarray(render("42")).convert("L"))
    assert image_to_string(g) == "42"
    assert image_to_string(g.astype(np.float32) / 255.0) == "42"


def test_rotated_tick_crop_via_apply_ocr_fallback(monkeypatch):
    """apply_ocr runs end to end WITHOUT pytesseract: the import falls
    back to ocr_lite, the >=3-aspect vertical tick is rotated upright and
    decoded, and the numeric cleanup applies."""
    from crct_tpu.detector import ocr as ocr_mod

    monkeypatch.setitem(sys.modules, "pytesseract", None)  # import fails

    # chart-like canvas: one vertical xtick label, one horizontal value
    img = Image.new("RGB", (200, 120), (255, 255, 255))
    d = ImageDraw.Draw(img)
    # NB: not a string with a difflib color near-match — apply_ocr
    # faithfully reproduces the reference's fuzzy color rewrite on ALL
    # text (e.g. "Argentina" -> "Magenta")
    tick = Image.new("RGB", (60, 14), (255, 255, 255))
    ImageDraw.Draw(tick).text((2, 1), "population", fill=(0, 0, 0))
    img.paste(tick.rotate(90, expand=True), (20, 30))   # vertical text
    d.text((100, 50), "(37.5)", fill=(0, 0, 0))
    image = np.asarray(img)

    cls_dict = {"xticklabel": 3}
    boxes = np.asarray([
        [20, 30, 34, 90],      # vertical tick, aspect>3 -> rotated
        [98, 48, 132, 62],     # numeric with stray parens
    ], np.float32)
    classes = np.asarray([3, 9])
    texts = ocr_mod.apply_ocr(image, boxes, classes, cls_dict)
    assert texts == ["population", "37.5"]


def test_color_name_fuzzy_match_survives_ocr(monkeypatch):
    """FigureQA color names decoded by ocr_lite land in the reference's
    difflib fuzzy match (case differences are the realistic error)."""
    from crct_tpu.detector import ocr as ocr_mod

    monkeypatch.setitem(sys.modules, "pytesseract", None)
    image = render("Dark Turquoise", canvas_h=22)
    boxes = np.asarray([[0, 0, image.shape[1] - 1, image.shape[0] - 1]],
                       np.float32)
    texts = ocr_mod.apply_ocr(image, boxes, np.asarray([9]),
                              {"xticklabel": 3})
    assert texts == ["Dark Turquoise"]
