"""Result formatters: plain / markdown / xml / color (+ json/text in cli).

The reference ships color/terminal/markdown/plain/json/xml formatters
(/root/reference/src/search/search_output.rs:9,184,498,556); these are the
transcript-engine analogs over the result rows (doc_id, score,
matched_terms, conv_id, turn_idx, role, tool, ts, text).  Pure driver-side
presentation over the collected top-k — no Spark involvement.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

_ANSI_BOLD = "\x1b[1m"
_ANSI_DIM = "\x1b[2m"
_ANSI_CYAN = "\x1b[36m"
_ANSI_RESET = "\x1b[0m"


def _loc(d: dict) -> str:
    if "turn_lo" in d:  # merged spans carry a turn range
        return f"{d.get('conv_id')}:{d['turn_lo']}-{d['turn_hi']}"
    return f"{d.get('conv_id')}:{d.get('turn_idx')}"


def format_plain(rows: list[dict]) -> str:
    """search_output.rs plain format analog: location + score + body."""
    parts = []
    for d in rows:
        parts.append(f"{_loc(d)}")
        parts.append(f"score: {d.get('score', 0.0):.4f}")
        if d.get("matched_terms"):
            parts.append("matched: " + ", ".join(d["matched_terms"]))
        parts.append(d.get("text") or "")
        parts.append("")
    return "\n".join(parts).rstrip("\n")


def format_markdown(rows: list[dict]) -> str:
    """search_output.rs markdown format analog: heading + fenced body."""
    parts = []
    for i, d in enumerate(rows, 1):
        parts.append(f"## {i}. {_loc(d)} (score {d.get('score', 0.0):.4f})")
        if d.get("matched_terms"):
            parts.append(
                "*matched:* " + ", ".join(f"`{t}`" for t in d["matched_terms"])
            )
        parts.append("```")
        parts.append(d.get("text") or "")
        parts.append("```")
        parts.append("")
    return "\n".join(parts).rstrip("\n")


def format_xml(rows: list[dict]) -> str:
    """search_output.rs xml format analog (schema mirrored by the json
    fields; values XML-escaped)."""
    parts = ["<results>"]
    for d in rows:
        parts.append("  <result>")
        for key in ("doc_id", "score", "conv_id", "turn_idx", "role", "tool"):
            if key in d and d[key] is not None:
                parts.append(f"    <{key}>{escape(str(d[key]))}</{key}>")
        if d.get("matched_terms"):
            parts.append(
                "    <matched_terms>"
                + "".join(f"<term>{escape(t)}</term>" for t in d["matched_terms"])
                + "</matched_terms>"
            )
        parts.append(f"    <text>{escape(d.get('text') or '')}</text>")
        parts.append("  </result>")
    parts.append("</results>")
    return "\n".join(parts)


def _highlight(text: str, terms: list[str]) -> str:
    """Bold every case-insensitive occurrence of a matched term inside the
    text (the reference's color output highlights matched keywords,
    search_output.rs).  Matched terms are stems, so substring occurrences
    inside surface forms ('handl' in 'handling') highlight too — same
    visual effect the reference's per-keyword line marking gives."""
    import re

    if not terms:
        return text
    pat = re.compile(
        "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True)),
        re.IGNORECASE,
    )
    return pat.sub(
        lambda m: f"{_ANSI_BOLD}{_ANSI_CYAN}{m.group(0)}{_ANSI_RESET}", text
    )


def format_color(rows: list[dict]) -> str:
    """search_output.rs color/terminal format analog (ANSI), matched
    keywords highlighted in the body."""
    parts = []
    for d in rows:
        parts.append(
            f"{_ANSI_BOLD}{_ANSI_CYAN}{_loc(d)}{_ANSI_RESET} "
            f"{_ANSI_DIM}score {d.get('score', 0.0):.4f}{_ANSI_RESET}"
        )
        if d.get("matched_terms"):
            parts.append(
                _ANSI_DIM + "matched: "
                + ", ".join(d["matched_terms"]) + _ANSI_RESET
            )
        parts.append(
            _highlight(d.get("text") or "", d.get("matched_terms") or [])
        )
        parts.append("")
    return "\n".join(parts).rstrip("\n")


FORMATTERS = {
    "plain": format_plain,
    "markdown": format_markdown,
    "xml": format_xml,
    "color": format_color,
    "terminal": format_color,  # reference alias (search_output.rs)
}
