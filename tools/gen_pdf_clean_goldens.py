#!/usr/bin/env python
"""Generate PDF text-cleanup golden fixtures.

Runs the reference's clean_pdf_text / clean_pdf_text_to_html
(processors/pdf/utils.py — pure re/html functions, no PyPDF2 needed)
over a curated page-text matrix and freezes the outputs under
tests/golden/pdf_clean/. The goldens are BEHAVIORAL fixtures — the
engine's ports (functions/pdfkit.pdf_text_to_markdown / _html) must
byte-match them; no reference code is copied into the engine.

The module is staged to /tmp before import so the reference package's
types.py never shadows the stdlib.

Run from /root/repo with the reference checkout present:
    python tools/gen_pdf_clean_goldens.py
"""

import importlib.util
import json
import os
import shutil
import tempfile

CASES = {
    "plain_paragraph": "This is a simple paragraph of text that flows\n"
                       "across multiple lines without any markers.\n",
    "title_first_line": "A Short Paper Title\nThen the body text starts\n"
                        "here and continues.\n",
    "numbered_headers": "Intro text.\n\n2.1 Background\nBody of the "
                        "background section follows here.\n\n"
                        "3 Methods\nMethod text.\n",
    "authors_page1": "Deep Learning Survey Paper\nJohn Smith, Jane Doe "
                     "and Alan Turing\nBody text follows after authors.\n",
    "affiliation": "†University of Somewhere\nMore text.\n",
    "emails": "{john, jane}@example.org\nBody.\n",
    "sections": "Abstract\nThis paper presents things.\n\nReferences\n"
                "[1] Someone 2020.\n",
    "quotes": '"To be or not to be\nthat is the question.\n',
    "hyphenation": "This line ends with a hyph-\nenated word that "
                   "continues.\n",
    "citations": "As shown before (Smith et al. 2020) the result holds.\n",
    "sentence_breaks": "First sentence ends.\nSecond sentence starts "
                       "here and ends.\nThird one.\n",
    "figure_table": "Figure 3: A diagram\nTable 2: Results\nBody.\n",
    "empty": "",
    "single_line": "Just one lonely line\n",
    "unicode_escapes": "Text with \\u2020 dagger and math \\ud835 "
                       "leftovers.\n",
    "punct_spacing": "Odd spacing before , comma and . period and ) "
                     "paren.\n",
    "mixed_page": "An Interesting Document Title\nBob Johnson and "
                  "Carol White\n†Institute of Testing\n\n1 Introduction"
                  "\nThe introduction paragraph spans\nseveral lines "
                  "and ends.\n\n2.2 Deep Dive\nDetails here with a "
                  "hyph-\nenated continuation (Jones et al. 2019).\n",
}


def stage_reference() -> str:
    src = "/root/reference/crawl4ai/processors/pdf/utils.py"
    tmp = tempfile.mkdtemp(prefix="pdfutils_stage_")
    dst = os.path.join(tmp, "ref_pdf_utils.py")
    shutil.copy(src, dst)
    return dst


def main() -> None:
    path = stage_reference()
    spec = importlib.util.spec_from_file_location("ref_pdf_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out_dir = "tests/golden/pdf_clean"
    os.makedirs(out_dir, exist_ok=True)
    goldens = {}
    for name, text in CASES.items():
        for page in (1, 2):
            goldens[f"{name}|p{page}|md"] = mod.clean_pdf_text(page, text)
            goldens[f"{name}|p{page}|html"] = \
                mod.clean_pdf_text_to_html(page, text)
    with open(os.path.join(out_dir, "goldens.json"), "w") as f:
        json.dump({"cases": CASES, "goldens": goldens}, f, indent=1,
                  ensure_ascii=False)
    print(f"wrote {len(goldens)} goldens to {out_dir}/goldens.json")


if __name__ == "__main__":
    main()
