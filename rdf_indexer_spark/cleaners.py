"""Archive-gated custom text cleaners (T-7).

The reference loads one ``ICustomCleaner`` implementation reflectively per run
(``RawTextCleaner.java:94-105``); four exist under
``src/main/java/org/nines/cleaner/``. Each is a line-oriented state machine;
they are reimplemented here as pure functions (reference file:line cited per
function) and dispatched by a registry keyed by archive name. In the Spark
pipeline they run inside the Arrow-batched ``clean_raw_text_udf``
(analyzer.py), gated with a native ``when(archive == …)`` so non-matching rows
never pay the Python cost.
"""

from __future__ import annotations


def _strip_between_markers(content: str, start_word: str, stop_word: str) -> str:
    """Keep only lines strictly between exact marker lines, toggling at each
    marker (CaliCleaner.java:16-31)."""
    out = []
    skip = True
    for line in content.split("\n"):
        if line == start_word or line == stop_word:
            skip = not skip
        elif not skip:
            out.append(line)
    return "\n".join(out) + ("\n" if out else "")


def cali_clean(archive: str, content: str) -> str:
    """CaliCleaner.java:7-31 — keep text between the exact lines
    'Search Text:' and 'fetching image...'."""
    if archive != "cali":
        return content
    return _strip_between_markers(content, "Search Text:", "fetching image...").strip()


def loc_ephemera_clean(archive: str, content: str) -> str:
    """LocEphemeraCleaner.java:7-83 — accept content after the SECOND <hr>
    (case-insensitive substring match) until the SGML notice line; drop
    {...}-brace regions once accepting."""
    if archive != "locEphemera":
        return content
    start_word = "<hr>"
    stop_word = "Information about SGML version of this document."
    out: list[str] = []
    skip = True
    start_cnt = 0
    start_done = False
    in_brace = False
    for raw in content.split("\n"):
        line = raw.strip()
        if start_done:
            if "{" in line and "}" in line:
                while True:
                    p0 = line.find("{")
                    if p0 == -1:
                        break
                    p1 = line.find("}")
                    if p1 > -1:
                        line = line[:p0] + line[p1 + 1:]
                    else:
                        line = line[:p0]
            elif "{" in line:
                in_brace = True
                # faithful to the reference's odd append (line + prefix)
                out.append(line + line[: line.find("{")])
                continue
            elif "}" in line:
                in_brace = False
                line = line[line.find("}"):]
            if in_brace:
                continue
        if start_word in line.lower() and not start_done:
            start_cnt += 1
            if start_cnt == 2:
                skip = not skip
                start_done = True
        elif stop_word in line:
            skip = not skip
        elif not skip:
            out.append(line + "\n")
    return "".join(out).strip()


def ncaw_clean(archive: str, content: str) -> str:
    """NcawCleaner.java:7-78 — keep text bound by <td class="main_text"|
    "notes_text" … </td>, line-oriented."""
    if archive != "ncaw":
        return content
    starters = ('<td class="main_text"', '<td class="notes_text"')
    ender = "</td>"
    out: list[str] = []
    skip = True
    for raw in content.split("\n"):
        line = raw.strip()
        if not skip and ender in line:
            head = line[: line.find(ender)].strip()
            if head:
                out.append(head + "\n")
            skip = not skip
            continue
        handled = False
        for starter in starters:
            if starter in line:
                p0 = line.find(starter)
                p1 = line.find(">", p0)
                line = line[p1 + 1:]
                p2 = line.find(ender)
                if p2 > -1:
                    line = line[:p2].strip()
                    if line:
                        out.append(line + "\n")
                else:
                    line = line.strip()
                    if line:
                        out.append(line + "\n")
                    skip = not skip
                handled = True
                break
        if not handled and not skip:
            out.append(line + "\n")
    return "".join(out).strip()


def nineteen_clean(archive: str, content: str) -> str:
    """NineteenCleaner.java:7-36 — xhtml div (or p) region until the
    'Back to context...' / '<a class="action"' stop marker."""
    if archive != "nineteen":
        return content

    def strip_junk(text: str, start_word: str, stop_word: str) -> str:
        out = []
        skip = True
        for line in text.split("\n"):
            if start_word in line:
                skip = False
            elif stop_word in line:
                break
            elif not skip:
                out.append(line)
        return "\n".join(out).strip() if out else ""

    s = strip_junk(content, '<div xmlns="http://www.w3.org/1999/xhtml">', "Back to context...")
    if s:
        return s
    return strip_junk(content, '<p xmlns="http://www.w3.org/1999/xhtml">', '<a class="action"')


REGISTRY = {
    "cali": cali_clean,
    "locEphemera": loc_ephemera_clean,
    "ncaw": ncaw_clean,
    "nineteen": nineteen_clean,
}


def clean_with_registry(archive: str, content: str) -> str:
    """Dispatch to the archive's custom cleaner, or pass through."""
    fn = REGISTRY.get(archive)
    return fn(archive, content) if fn else content
