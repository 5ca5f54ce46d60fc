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
    b = text.find(begin)
    # the END must FOLLOW its BEGIN: splitting on the first end anywhere
    # would, after an orphaned-marker hand edit, splice away every
    # section between the orphan and a later block's end
    e = text.find(end, b + len(begin)) if b != -1 else -1
    if b != -1 and e != -1:
        text = text[:b] + block + text[e + len(end):]
    else:
        if b != -1 or end in text:
            raise ValueError(
                f"unpaired section markers for {name!r} in {path}: "
                "fix the file by hand before regenerating"
            )
        text = (text.rstrip() + "\n\n" if text.strip() else "") + block + "\n"
    with open(path, "w") as f:
        f.write(text)
