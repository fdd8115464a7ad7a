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


def _turn_span(d: dict) -> tuple[int, int]:
    if "turn_lo" in d:
        return d["turn_lo"], d["turn_hi"]
    t = d.get("turn_idx", 0) or 0
    return t, t


def _count_tokens_driver(text: str) -> int:
    """Driver-side token count for the output footers, same priority as
    the limiter (search/limiter.py): tiktoken package > ranks-file BPE >
    BPE-ish regex piece count."""
    try:  # pragma: no cover - tiktoken not in this container
        import tiktoken

        return len(tiktoken.get_encoding("p50k_base").encode(text))
    except Exception:
        pass
    from probe_spark.functions import bpe

    ranks = bpe.env_ranks()
    if ranks is not None:
        return bpe.count_tokens(text, ranks)
    import re

    from probe_spark.ops.text import BPE_REGEX

    return len(re.findall(BPE_REGEX, text))


def _cdata(text: str) -> str:
    # a "]]>" inside the body would close the section early; the standard
    # escape splits it across two CDATA sections
    return "<![CDATA[" + text.replace("]]>", "]]]]><![CDATA[>") + "]]>"


def format_terminal(rows: list[dict]) -> str:
    """The reference's default terminal layout (search_output.rs:44-80,
    170-180; golden sample /root/reference/result1.txt): per result a
    ``File:`` line, a ``Lines:`` span, a fenced body — then the
    ``Found N search results`` / ``Total bytes returned`` /
    ``Total tokens returned`` footer.  Transcript mapping: file =
    conv_id, lines = turn span, fence language = the reference's file
    extension slot (``text`` for transcripts)."""
    parts = []
    total_bytes = total_tokens = 0
    for d in rows:
        lo, hi = _turn_span(d)
        body = d.get("text") or ""
        parts.append(f"File: {d.get('conv_id')}")
        parts.append(f"Lines: {lo}-{hi}")
        parts.append("```text")
        parts.append(body)
        parts.append("```")
        total_bytes += len(body.encode("utf-8"))
        total_tokens += _count_tokens_driver(body)
    parts.append(f"Found {len(rows)} search results")
    parts.append(f"Total bytes returned: {total_bytes}")
    parts.append(f"Total tokens returned: {total_tokens}")
    return "\n".join(parts)


def format_xml(rows: list[dict]) -> str:
    """The reference's xml layout (search_output.rs:556-640): declaration,
    <probe_results> root, per result file/lines/node_type, optional
    <matched_keywords><keyword>, 4-dp <score>, CDATA <code>, then a
    <summary> with count and byte/token totals.  node_type is ``turn``
    (the transcript ranking unit, SURVEY §1.3)."""
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', "<probe_results>"]
    total_bytes = total_tokens = 0
    for d in rows:
        lo, hi = _turn_span(d)
        body = d.get("text") or ""
        parts.append("  <result>")
        parts.append(f"    <file>{escape(str(d.get('conv_id')))}</file>")
        parts.append(f"    <lines>{lo}-{hi}</lines>")
        parts.append("    <node_type>turn</node_type>")
        if d.get("matched_terms"):
            parts.append("    <matched_keywords>")
            for t in d["matched_terms"]:
                parts.append(f"      <keyword>{escape(t)}</keyword>")
            parts.append("    </matched_keywords>")
        if d.get("score") is not None:
            parts.append(f"    <score>{d['score']:.4f}</score>")
        parts.append(f"    <code>{_cdata(body)}</code>")
        parts.append("  </result>")
        total_bytes += len(body.encode("utf-8"))
        total_tokens += _count_tokens_driver(body)
    parts.append("  <summary>")
    parts.append(f"    <count>{len(rows)}</count>")
    parts.append(f"    <total_bytes>{total_bytes}</total_bytes>")
    parts.append(f"    <total_tokens>{total_tokens}</total_tokens>")
    parts.append("  </summary>")
    parts.append("</probe_results>")
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
    "terminal": format_terminal,  # reference default layout (result1.txt)
}
