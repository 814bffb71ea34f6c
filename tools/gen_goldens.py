#!/usr/bin/env python3
"""Golden-fixture generator.

Runs the *reference's own* Python functions (/root/reference/dots_ocr/utils/*)
on deterministic fixture inputs and records (input, expected_output) pairs as
JSONL under src/test/resources/golden/. The Scala kernel suites assert
byte-identity against these files (SURVEY.md §5.1).

Third-party modules the reference imports but which are absent here (PIL,
fitz, requests, pydantic, tqdm) are stubbed: none of the functions under test
touch them except `layoutjson2md`'s Picture branch, where we patch
`PILimage_to_base64` with the same deterministic placeholder the Scala side
uses (documented deviation: no rasterization — README.md:1218).

Deterministic: fixed seed, no wall clock. Run from /root/repo:
    python3 tools/gen_goldens.py
"""
import importlib.util
import json
import os
import random
import sys
import types

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "golden")
REF = "/root/reference/dots_ocr/utils/"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class FakeCrop:
    def __init__(self, box):
        self.box = box


class FakeImage:
    """Duck-typed stand-in for PIL.Image.Image (only .size/.width/.height/.crop used)."""

    def __init__(self, w, h):
        self.size = (w, h)
        self.width = w
        self.height = h

    def crop(self, box):
        return FakeCrop(box)


def load_reference_modules():
    _stub("tqdm", tqdm=lambda *a, **k: None)
    _stub("fitz")
    _stub("requests")

    class _BaseModel:
        pass

    _stub("pydantic", BaseModel=_BaseModel, Field=lambda *a, **k: None)
    pil = _stub("PIL")
    img_mod = types.ModuleType("PIL.Image")
    img_mod.Image = FakeImage
    sys.modules["PIL.Image"] = img_mod
    pil.Image = img_mod

    pkg = types.ModuleType("dots_ocr")
    pkg.__path__ = ["/root/reference/dots_ocr"]
    sys.modules["dots_ocr"] = pkg
    upkg = types.ModuleType("dots_ocr.utils")
    upkg.__path__ = [REF]
    sys.modules["dots_ocr.utils"] = upkg

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("dots_ocr.utils.consts", REF + "consts.py")
    load("dots_ocr.utils.doc_utils", REF + "doc_utils.py")
    iu = load("dots_ocr.utils.image_utils", REF + "image_utils.py")
    oc = load("dots_ocr.utils.output_cleaner", REF + "output_cleaner.py")
    ft = load("dots_ocr.utils.format_transformer", REF + "format_transformer.py")
    lu = load("dots_ocr.utils.layout_utils", REF + "layout_utils.py")
    return iu, oc, ft, lu


# Multilingual snippets matching the showcase coverage (FIXTURES.md §2).
MULTILINGUAL = [
    "Hello, world — a plain English sentence.",
    "对于数据密集型应用，吞吐量比延迟更重要。",
    "Привет, мир! Это тестовое предложение.",
    " བོད་ཡིག་གི་ཚིག་གྲུབ་འདི་ཚོད་ལྟའི་ཆེད་དུ་ཡིན།",
    "ಕನ್ನಡ ವಾಕ್ಯವೊಂದು ಪರೀಕ್ಷೆಗಾಗಿ ಇಲ್ಲಿದೆ.",
    "Dit is een Nederlandse testzin met ëéï.",
    "繁體中文測試句子，包含標點符號。",
    "Emoji \U0001f600 and astral \U0001d11e chars",
]


def gen_smart_resize(iu):
    rng = random.Random(42)
    cases = []
    dims = [
        (1000, 700), (28, 28), (1, 1), (10, 10), (56, 56), (57, 57),
        (4500, 4500), (5000, 4000), (10000, 8000), (200, 1), (201, 1),
        (1, 150), (1, 199), (100, 19900), (3508, 2480), (2339, 1654),
        (1080, 1920), (768, 1024), (42, 42), (70, 70), (98, 98), (14, 14),
        (42, 28), (14, 28), (70, 28), (126, 28), (3136, 3600), (29, 3),
        (4000, 20), (62, 50), (63, 50),
    ]
    # banker's-rounding edges: h/28 ends exactly in .5 → 14 + 28k
    dims += [(14 + 28 * k, 500) for k in range(0, 8)]
    dims += [(rng.randint(1, 6000), rng.randint(1, 6000)) for _ in range(150)]
    for h, w in dims:
        for fac, mn, mx in [(28, 3136, 11289600), (28, 3136, 1000000), (16, 3136, 11289600)]:
            try:
                hb, wb = iu.smart_resize(h, w, factor=fac, min_pixels=mn, max_pixels=mx)
                cases.append({"h": h, "w": w, "factor": fac, "min_pixels": mn,
                              "max_pixels": mx, "h_bar": hb, "w_bar": wb})
            except ValueError:
                cases.append({"h": h, "w": w, "factor": fac, "min_pixels": mn,
                              "max_pixels": mx, "error": "aspect"})
    rbf = [{"n": n, "f": f, "out": iu.round_by_factor(n, f)}
           for n in list(range(0, 600, 7)) + [14, 42, 70, 98, 126]
           for f in (28, 16, 3)]
    return cases, rbf


def gen_bbox_rescale(lu):
    rng = random.Random(43)
    cases = []
    configs = [
        (1000, 700, 1000, 700), (2480, 3508, 2480, 3508), (500, 300, 960, 540),
        (4000, 3000, 4000, 3000), (100, 60, 100, 60), (799, 1202, 799, 1202),
    ]
    for ow, oh, iw, ih in configs:
        for _ in range(6):
            x1, y1 = rng.randint(0, iw - 2), rng.randint(0, ih - 2)
            x2, y2 = rng.randint(x1 + 1, iw), rng.randint(y1 + 1, ih)
            bboxes = [[x1, y1, x2, y2]]
            pre = lu.pre_process_bboxes(FakeImage(ow, oh), bboxes, input_width=iw, input_height=ih,
                                        min_pixels=3136, max_pixels=11289600)
            cases.append({"kind": "pre", "ow": ow, "oh": oh, "iw": iw, "ih": ih,
                          "bbox": [x1, y1, x2, y2], "out": pre[0]})
            cells = [{"bbox": [x1, y1, x2, y2], "category": "Text", "text": "t"}]
            post = lu.post_process_cells(FakeImage(ow, oh), cells, iw, ih,
                                         min_pixels=3136, max_pixels=11289600)
            cases.append({"kind": "post", "ow": ow, "oh": oh, "iw": iw, "ih": ih,
                          "bbox": [x1, y1, x2, y2], "out": post[0]["bbox"]})
    # str/float bbox coords + key-order preservation + negative coords
    cells = [{"text": "keep-order", "bbox": ["12.5", 20.9, 300, 400.0], "category": "Text", "extra": 1}]
    post = lu.post_process_cells(FakeImage(1000, 800), cells, 1000, 800)
    cases.append({"kind": "post_raw", "ow": 1000, "oh": 800, "iw": 1000, "ih": 800,
                  "cells": cells, "out_json": json.dumps(post, ensure_ascii=False)})
    cells2 = [{"bbox": [-15, -3, 50, 60], "category": "Text"}]
    post2 = lu.post_process_cells(FakeImage(300, 200), cells2, 900, 600)
    cases.append({"kind": "post_raw", "ow": 300, "oh": 200, "iw": 900, "ih": 600,
                  "cells": cells2, "out_json": json.dumps(post2, ensure_ascii=False)})
    return cases


def cleaner_inputs():
    zh = MULTILINGUAL[1]
    ru = MULTILINGUAL[2]
    bo = MULTILINGUAL[3]
    good = '[{"bbox": [10, 20, 110, 60], "category": "Text", "text": "hello"}]'
    cases = [
        # valid json (no repair needed at cleaner level)
        good,
        # missing delimiter between dicts
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"} {"bbox": [5, 6, 7, 8], "category": "Text", "text": "b"}]',
        # missing delimiter w/ newline whitespace
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}\n  {"bbox": [5, 6, 7, 8], "category": "Title", "text": "b"}]',
        # truncated tail (no closing bracket) multiple dicts
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}, {"bbox": [5, 6, 7, 8], "category": "Text", "text": "' + zh,
        # truncated tail single dict → no truncation, fallback2
        '[{"bbox": [1, 2, 3, 4], "category": "Title", "text": "unfinished ' + ru,
        # single incomplete dict without category
        '[{"bbox": [9, 8, 7, 6], "text": "no category here',
        # single incomplete dict, bbox only
        '[{"bbox": [1, 2, 3, 4]',
        # single incomplete with 3-coord bbox → fallback2 fails (len != 4)
        '[{"bbox": [1, 2, 3], "text": "x',
        # duplicate dict strings ×3
        '[' + ', '.join(['{"bbox": [1, 2, 3, 4], "category": "Text", "text": "dup"}'] * 3) + ']',
        # (category,text) pair ×4 with distinct bboxes → below threshold, kept
        '[' + ', '.join('{"bbox": [%d, 2, %d, 4], "category": "Text", "text": "p"}' % (i, i + 10) for i in range(4)) + ']',
        # (category,text) pair ×5 with distinct bboxes → dedup keeps first
        '[' + ', '.join('{"bbox": [%d, 2, %d, 4], "category": "Text", "text": "p"}' % (i, i + 10) for i in range(5)) + ']',
        # same bbox ×2 different text → bbox dedup drops second
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}, {"bbox": [1, 2, 3, 4], "category": "Title", "text": "b"}]',
        # bbox as float/int mix — Python tuple equality 1 == 1.0
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"}, {"bbox": [1.0, 2, 3, 4], "category": "Title", "text": "b"}]',
        # not json at all
        'The layout contains a title and two paragraphs.',
        # dict, not list
        '{"bbox": [1, 2, 3, 4], "category": "Text", "text": "solo"}',
        # empty string / empty list
        '', '[]',
        # multilingual content with escapes and astral chars
        '[{"bbox": [0, 0, 10, 10], "category": "Text", "text": "' + bo + '"}, {"bbox": [0, 20, 10, 30], "category": "Text", "text": "line\\nbreak\\t' + MULTILINGUAL[7] + '"}]',
        # trailing comma
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"},',
        # missing-delimiter inside, then truncated tail
        '{"bbox": [1, 2, 3, 4], "category": "Text", "text": "a"} {"bbox": [5, 6, 7, 8], "category": "Text", "text": "b"}, {"bbox": [9, 9, 9',
        # nested braces inside text (regex [^{}] cannot match) — falls to fallback paths
        '[{"bbox": [1, 2, 3, 4], "category": "Text", "text": "curly {x} inside"}, {"bbox": [5, 6, 7, 8], "category": "Text", "text": "ok"}]',
    ]
    # >50k truncation case
    big = '[' + ', '.join('{"bbox": [%d, 0, %d, 9], "category": "Text", "text": "%s"}' % (i, i + 5, 'x' * 40) for i in range(700)) + ', {"bbox": [1, 1, 1'
    cases.append(big)
    # >50k but ends with ']' → still truncates (len rule)
    big2 = '[' + ', '.join('{"bbox": [%d, 0, %d, 9], "category": "Text", "text": "%s"}' % (i, i + 5, 'y' * 40) for i in range(700)) + ']'
    cases.append(big2)
    return cases


def list_cleaner_inputs():
    return [
        # 3-coord bbox → drop bbox keep (category,text); order category,text
        [{"text": "t-first", "bbox": [1, 2, 3], "category": "Cat"}],
        [{"bbox": [1, 2, 3], "text": "only-text"}],
        [{"bbox": [1, 2, 3]}],
        # bbox len 4 → kept verbatim w/ key order
        [{"text": "x", "category": "Text", "bbox": [1, 2, 3, 4]}],
        # bbox len 5 / non-list → dropped
        [{"bbox": [1, 2, 3, 4, 5], "category": "Text"}, {"bbox": "oops", "category": "Text"},
         {"category": "NoBbox", "text": "kept"}, {"text": "dropped-no-cat"}, "not-a-dict", 42],
        # bbox dedup across list input (threshold ≥2)
        [{"bbox": [1, 2, 3, 4], "category": "A", "text": "1"},
         {"bbox": [1, 2, 3, 4], "category": "B", "text": "2"},
         {"bbox": [9, 9, 10, 10], "category": "C", "text": "3"}],
        # single item → dedup skipped entirely
        [{"bbox": [1, 2, 3, 4], "category": "A", "text": "1"}],
    ]


def gen_cleaner(oc):
    out = []
    for s in cleaner_inputs():
        cleaner = oc.OutputCleaner()
        res = cleaner.clean_model_output(s)
        out.append({"input": s, "out_json": json.dumps(res, ensure_ascii=False)})
    for lst in list_cleaner_inputs():
        cleaner = oc.OutputCleaner()
        res = cleaner.clean_model_output(lst)
        out.append({"input_list_json": json.dumps(lst, ensure_ascii=False),
                    "out_json": json.dumps(res, ensure_ascii=False)})
    return out


def gen_formula(ft):
    texts = [
        "$$E = mc^2$$", "$$a$b$$", "$$$$", "$$", "\\[x + y = z\\]",
        "pre \\[x\\] post", "inline $x+y$ text", "$x$ and $y$",
        "E = mc^2", "plain text, no latex", "",
        "\\frac{a}{b}", "\\alpha", "\\begin{align}x\\end{align}",
        "\\documentclass{article}\\usepackage{amsmath}\\begin{document}x=1\\end{document}",
        "\\usepackage{amsmath} E=mc^2",
        "`\\frac{1}{2}`", "`$x$`", "  $$ padded $$  ",
        "\\[\nmultiline\n\\]", "$$\nalready\n$$", "a \\command{x} b",
        "\\USEPACKAGE{shout} x", "\\usepackage{a}",
        "text $ lone dollar", "$$start only", "end only$$",
        "\\(inline paren\\)", MULTILINGUAL[1] + " $x$", "x\ny $$z$$",
    ]
    out = []
    for t in texts:
        try:
            r = ft.get_formula_in_markdown(t)
            out.append({"input": t, "out": r})
        except IndexError:
            out.append({"input": t, "error": "IndexError"})
        if isinstance(t, str):
            out.append({"kind": "has_latex", "input": t, "out": ft.has_latex_markdown(t)})
    clean_texts = ["  padded  ", "`$x$`", "`$x$` ", "`$`", "``", "", "a  b", "\u00a0nbsp\u00a0",
                   "\ttab\t", MULTILINGUAL[3], "`$" + MULTILINGUAL[1] + "$`"]
    for t in clean_texts:
        out.append({"kind": "clean_text", "input": t, "out": ft.clean_text(t)})
    return out


def gen_layout2md(ft, iu):
    # Patch the picture embed with the same deterministic placeholder the
    # Scala side emits (no rasterization in either implementation).
    import base64 as b64mod

    def fake_b64(image_crop, format="PNG"):
        x1, y1, x2, y2 = image_crop.box
        payload = "crop:%d,%d,%d,%d" % (x1, y1, x2, y2)
        return "data:image/png;base64," + b64mod.b64encode(payload.encode()).decode()

    ft.PILimage_to_base64 = fake_b64
    img = FakeImage(1000, 800)
    case_cells = [
        [
            {"bbox": [10, 5, 500, 40], "category": "Title", "text": "# A Title"},
            {"bbox": [10, 50, 500, 80], "category": "Page-header", "text": "Running head"},
            {"bbox": [10, 90, 500, 200], "category": "Text", "text": "  Body text. "},
            {"bbox": [10, 210, 300, 300], "category": "Picture"},
            {"bbox": [10, 310, 500, 380], "category": "Formula", "text": "E = mc^2 \\alpha"},
            {"bbox": [10, 390, 500, 450], "category": "Table", "text": "<table><tr><td>1</td></tr></table>"},
            {"bbox": [10, 460, 500, 500], "category": "Page-footer", "text": "page 3"},
            {"bbox": [10, 510, 500, 540], "category": "List-item", "text": "- item one"},
            {"bbox": [10, 550, 500, 580], "category": "Footnote", "text": "[1] note"},
            {"bbox": [10, 590, 500, 620], "category": "Caption", "text": "Fig. 1: caption"},
            {"bbox": [10, 630, 500, 660], "category": "Section-header", "text": "## Section"},
        ],
        [
            {"bbox": [0, 0, 10, 10], "category": "Text", "text": MULTILINGUAL[1]},
            {"bbox": [0, 20, 10, 30], "category": "Text", "text": MULTILINGUAL[3]},
            {"bbox": [0, 40, 10, 50], "category": "Unknown-cat", "text": "tolerated"},
            {"bbox": [0, 60, 10, 70], "category": "Text"},
            {"bbox": [0.9, 80.7, 10.2, 90.9], "category": "Text", "text": "float bbox"},
        ],
    ]
    out = []
    for cells in case_cells:
        md = ft.layoutjson2md(img, cells, text_key="text")
        md_nohf = ft.layoutjson2md(img, cells, text_key="text", no_page_hf=True)
        out.append({"cells_json": json.dumps(cells, ensure_ascii=False), "md": md, "md_nohf": md_nohf})
    return out


def gen_post_process_output(lu):
    cases = []
    configs = [(1000, 800, 980, 784), (2480, 3508, 2480, 3508), (500, 400, 1000, 800)]
    responses = [
        '[{"bbox": [100, 50, 400, 90], "category": "Title", "text": "T"}, {"bbox": [100, 100, 400, 300], "category": "Text", "text": "' + MULTILINGUAL[6] + '"}]',
        '[{"bbox": [10, 10, 20, 20], "category": "Text", "text": "a"} {"bbox": [30, 30, 40, 40], "category": "Text", "text": "b"}]',
        'not json at all',
        '[{"bbox": [5, 5, 50, 50], "category": "Text", "text": "begin ' + MULTILINGUAL[2],
        '{"not": "a list"}',
        '"just a string"',
        '[{"bbox": [1, 2, 3], "category": "Text", "text": "threecoord"}, {"bbox": [4, 5, 6, 7], "category": "Text", "text": "ok"}]',
    ]
    for (ow, oh, iw, ih) in configs:
        for resp in responses:
            r, filtered = lu.post_process_output(
                resp, "prompt_layout_all_en", FakeImage(ow, oh), FakeImage(iw, ih))
            if filtered:
                cases.append({"ow": ow, "oh": oh, "iw": iw, "ih": ih, "response": resp,
                              "filtered": True, "out": r if isinstance(r, str) else json.dumps(r, ensure_ascii=False)})
            else:
                cases.append({"ow": ow, "oh": oh, "iw": iw, "ih": ih, "response": resp,
                              "filtered": False, "out": json.dumps(r, ensure_ascii=False)})
    return cases


def gen_float_repr():
    vals = [0.0, -0.0, 1.0, -1.5, 0.1, 0.25, 1e16, 1e15, 1.5e16, 0.0001, 0.00001,
            -2.5e-7, 3.14159265358979, 123456789.123456, 1e100, -1e-100, 2.0,
            1.7976931348623157e308, 5e-324, 0.3333333333333333, 1e23, 9.999999999999999e22]
    return [{"in_hex": v.hex(), "repr": repr(v), "dumps": json.dumps(v)} for v in vals]


def main():
    os.makedirs(OUT, exist_ok=True)
    iu, oc, ft, lu = load_reference_modules()

    def write(name, rows):
        with open(os.path.join(OUT, name), "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        print(f"wrote {name}: {len(rows)} rows")

    sr, rbf = gen_smart_resize(iu)
    write("smart_resize.jsonl", sr)
    write("round_by_factor.jsonl", rbf)
    write("bbox_rescale.jsonl", gen_bbox_rescale(lu))
    write("cleaner.jsonl", gen_cleaner(oc))
    write("formula_md.jsonl", gen_formula(ft))
    write("layout2md.jsonl", gen_layout2md(ft, iu))
    write("post_process_output.jsonl", gen_post_process_output(lu))
    write("float_repr.jsonl", gen_float_repr())


if __name__ == "__main__":
    main()
