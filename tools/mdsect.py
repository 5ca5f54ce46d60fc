"""Marker-delimited section replace for generated Markdown.

SCALING.md is assembled from more than one tool (scale_probe,
crossover_probe) plus hand-written analysis; each generator owns one
``<!-- BEGIN name --> ... <!-- END name -->`` block and rewrites only
that, so re-running one probe can't clobber the others' sections.
"""

from __future__ import annotations

import os


def replace_section(path: str, name: str, content: str) -> None:
    begin, end = f"<!-- BEGIN {name} -->", f"<!-- END {name} -->"
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    block = f"{begin}\n{content.rstrip()}\n{end}"
    if begin in text and end in text:
        pre, rest = text.split(begin, 1)
        _, post = rest.split(end, 1)
        text = pre + block + post
    else:
        text = (text.rstrip() + "\n\n" if text.strip() else "") + block + "\n"
    with open(path, "w") as f:
        f.write(text)
