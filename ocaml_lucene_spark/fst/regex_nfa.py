"""Regex -> NFA for automaton∩FST term expansion (RegexpQuery's
sub-linear path).

Lucene compiles a RegexpQuery to a DFA and intersects it with the
terms-dictionary FST (the same seek surface the reference's
terms_enumerator exposes; see also fuzzy's Levenshtein automaton in
transducer.levenshtein_items). This module compiles the SUPPORTED
subset of Python-re syntax (which the engine keeps inside the
Python-re ∩ RE2 common subset for oracle parity) to a Thompson NFA
whose state-set simulation the FST walk carries: empty state set =
dead subtree (prune), accepting state at a final FST node = matched
term. Lazy subset construction via direct NFA-set stepping — patterns
are tiny, so O(|states|) per character beats building the full DFA.

The parse tree comes from re's own parser (the battle-tested grammar —
no hand-rolled regex parsing), so semantics match re.fullmatch exactly
on the supported subset: literals, '.', character classes with ranges
and negation, *, +, ?, {m,n}, alternation, and plain groups.
Unsupported constructs (anchors, backrefs, lookaround, category
escapes like \\d, flags) raise UnsupportedRegexError and the caller
falls back to the mandatory-literal-prefix subtree scan.
"""

from __future__ import annotations

try:
    import re._parser as _sre  # CPython >= 3.11
    from re._constants import MAXREPEAT as _MAXREPEAT
except ImportError:  # pragma: no cover
    import sre_parse as _sre  # type: ignore[no-redef]
    from sre_constants import MAXREPEAT as _MAXREPEAT  # type: ignore[no-redef]


class UnsupportedRegexError(ValueError):
    """Pattern uses a construct outside the automaton-compilable
    subset; callers fall back to the prefix-scan path."""


class Nfa:
    """Thompson NFA. States are ints; ``trans[s]`` holds
    (kind, arg, target) edges with kind in {"eps", "lit", "any",
    "in"}; ``accept`` is the single accepting state."""

    def __init__(self):
        self.trans: list[list[tuple[str, object, int]]] = []
        self.accept: int = -1

    def _new_state(self) -> int:
        self.trans.append([])
        return len(self.trans) - 1

    def _closure(self, states: frozenset[int]) -> frozenset[int]:
        seen = set(states)
        stack = list(states)
        while stack:
            s = stack.pop()
            for kind, _arg, t in self.trans[s]:
                if kind == "eps" and t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    def start_set(self) -> frozenset[int]:
        return self._closure(frozenset([0]))

    def step(self, states: frozenset[int], ch: str) -> frozenset[int]:
        code = ord(ch)
        nxt = set()
        for s in states:
            for kind, arg, t in self.trans[s]:
                if kind == "lit":
                    if code == arg:
                        nxt.add(t)
                elif kind == "any":
                    if ch != "\n":  # '.' excludes newline, like re
                        nxt.add(t)
                elif kind == "in":
                    negate, items = arg
                    hit = any(lo <= code <= hi for lo, hi in items)
                    if hit != negate:
                        nxt.add(t)
        return self._closure(frozenset(nxt)) if nxt else frozenset()

    def accepts(self, states: frozenset[int]) -> bool:
        return self.accept in states


def _compile_in(av) -> tuple[bool, list[tuple[int, int]]]:
    negate = False
    items: list[tuple[int, int]] = []
    for op, arg in av:
        name = str(op)
        if name == "NEGATE":
            negate = True
        elif name == "LITERAL":
            items.append((arg, arg))
        elif name == "RANGE":
            items.append((arg[0], arg[1]))
        else:  # CATEGORY (\d, \w, ...) and friends
            raise UnsupportedRegexError(f"char-class item {name}")
    return negate, items


def _build(nfa: Nfa, seq, start: int) -> int:
    """Compile a parse-tree sequence starting at ``start``; return the
    fragment's end state."""
    cur = start
    for op, av in seq:
        name = str(op)
        if name == "LITERAL":
            nxt = nfa._new_state()
            nfa.trans[cur].append(("lit", av, nxt))
            cur = nxt
        elif name == "NOT_LITERAL":
            nxt = nfa._new_state()
            nfa.trans[cur].append(("in", (True, [(av, av)]), nxt))
            cur = nxt
        elif name == "ANY":
            nxt = nfa._new_state()
            nfa.trans[cur].append(("any", None, nxt))
            cur = nxt
        elif name == "IN":
            nxt = nfa._new_state()
            nfa.trans[cur].append(("in", _compile_in(av), nxt))
            cur = nxt
        elif name == "BRANCH":
            _, branches = av
            join = nfa._new_state()
            for b in branches:
                b_start = nfa._new_state()
                nfa.trans[cur].append(("eps", None, b_start))
                b_end = _build(nfa, b, b_start)
                nfa.trans[b_end].append(("eps", None, join))
            cur = join
        elif name == "SUBPATTERN":
            # (group, add_flags, del_flags, seq) — flags unsupported
            _gid, add_flags, del_flags, sub = av
            if add_flags or del_flags:
                raise UnsupportedRegexError("inline flags")
            cur = _build(nfa, sub, cur)
        elif name in ("MAX_REPEAT", "MIN_REPEAT"):
            lo, hi, sub = av
            for _ in range(lo):  # mandatory copies
                cur = _build(nfa, sub, cur)
            if hi == _MAXREPEAT:  # star over one more copy
                loop_start = nfa._new_state()
                nfa.trans[cur].append(("eps", None, loop_start))
                body_end = _build(nfa, sub, loop_start)
                nfa.trans[body_end].append(("eps", None, loop_start))
                out = nfa._new_state()
                nfa.trans[loop_start].append(("eps", None, out))
                cur = out
            else:
                for _ in range(hi - lo):  # optional copies
                    skip_to = nfa._new_state()
                    nfa.trans[cur].append(("eps", None, skip_to))
                    body_end = _build(nfa, sub, cur)
                    nfa.trans[body_end].append(("eps", None, skip_to))
                    cur = skip_to
        else:  # AT (anchors), GROUPREF, ASSERT, ...
            raise UnsupportedRegexError(f"construct {name}")
    return cur


def compile_nfa(pattern: str) -> Nfa:
    """Compile ``pattern`` (implicitly fullmatch-anchored, matching
    RegexpQuery semantics) to an NFA; UnsupportedRegexError outside the
    supported subset."""
    try:
        seq = _sre.parse(pattern)
    except Exception as e:  # delegate real syntax errors to re.compile
        raise UnsupportedRegexError(str(e)) from e
    # global inline flags — (?i), (?s), ... — live on the parse STATE,
    # not as tree nodes; anything beyond the default UNICODE bit would
    # silently change match semantics here, so refuse
    import re as _re

    if seq.state.flags & ~_re.UNICODE.value:
        raise UnsupportedRegexError(f"pattern flags {seq.state.flags:#x}")
    nfa = Nfa()
    start = nfa._new_state()
    assert start == 0
    nfa.accept = _build(nfa, seq, start)
    return nfa
