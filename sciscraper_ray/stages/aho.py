"""Aho-Corasick multi-pattern scanner — the one-pass dictionary-matching
stage (Aho & Corasick 1975, CACM 18(6)).

The reference scans documents for term dictionaries one term at a time
(``match_terms`` over tokenized words); this stage is the substring
analog a 100 TB corpus pipeline needs: ONE pass over the raw text
counts every occurrence of every dictionary pattern simultaneously —
blocklist scrubbing, PII lexicons, contamination probes.

Construction (goto trie -> BFS failure links -> failure-collapsed DFA
over the byte alphabet) happens once per actor in ``__init__``; the
per-document scan is a sequential walk of the DFA transition table —
like the codecs' bit loops, the data dependence is inherent (state t+1
depends on state t), so the hot loop iterates chars while everything
per-state (transitions, output counts) is precomputed numpy. Patterns
and text are compared case-folded by the caller.

Counting semantics: ALL occurrences, including a pattern ending inside
a longer match ("he" fires inside "she") — the output function follows
suffix links, collapsed here into a per-state hit-count vector.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class AhoCorasick:
    """DFA-compiled Aho-Corasick automaton over UTF-8 bytes.

    ``counts = ac.scan_counts(text)`` returns an int64 vector of
    occurrence counts aligned with the constructor's pattern order.
    """

    def __init__(self, patterns: list[str]) -> None:
        if not patterns:
            raise ValueError("empty pattern list")
        pats = [p.encode("utf-8") for p in patterns]
        if any(not p for p in pats):
            raise ValueError("empty pattern")
        # goto trie
        goto: list[dict[int, int]] = [{}]
        out_pat: list[list[int]] = [[]]
        for pi, pat in enumerate(pats):
            s = 0
            for byte in pat:
                nxt = goto[s].get(byte)
                if nxt is None:
                    goto.append({})
                    out_pat.append([])
                    nxt = len(goto) - 1
                    goto[s][byte] = nxt
                s = nxt
            out_pat[s].append(pi)
        n_states = len(goto)
        fail = np.zeros(n_states, np.int32)
        # per-state TOTAL hits vector would be (states x patterns); keep it
        # sparse: per-state list of pattern ids reachable via suffix links
        hits: list[list[int]] = [list(o) for o in out_pat]
        # BFS: failure links + DFA collapse
        dfa = np.zeros((n_states, 256), np.int32)
        q: deque[int] = deque()
        for byte, s in goto[0].items():
            dfa[0, byte] = s
            q.append(s)
        while q:
            s = q.popleft()
            f = int(fail[s])
            hits[s].extend(hits[f])
            for byte, t in goto[s].items():
                fail[t] = dfa[f, byte]
                q.append(t)
            # collapse: unseen bytes follow the failure state's transition
            row = dfa[f].copy()
            for byte, t in goto[s].items():
                row[byte] = t
            dfa[s] = row
        self.dfa = dfa
        self.n_patterns = len(pats)
        # per-state hit increments as a dense (states, patterns) int64 —
        # dictionaries are small (vocab-bounded), so this stays tiny
        inc = np.zeros((n_states, self.n_patterns), np.int64)
        for s, ps in enumerate(hits):
            for pi in ps:
                inc[s, pi] += 1
        self.inc = inc
        self.has_hits = inc.any(axis=1)

    def scan_counts(self, text: str) -> np.ndarray:
        """Occurrence counts (ALL matches, overlapping) per pattern."""
        counts = np.zeros(self.n_patterns, np.int64)
        dfa = self.dfa
        inc = self.inc
        has_hits = self.has_hits
        s = 0
        for byte in text.encode("utf-8"):
            s = dfa[s, byte]
            if has_hits[s]:
                counts += inc[s]
        return counts

    def scan_batch(self, texts: list[str]) -> np.ndarray:
        """(n_texts, n_patterns) count matrix; state resets per text."""
        out = np.empty((len(texts), self.n_patterns), np.int64)
        for i, t in enumerate(texts):
            out[i] = self.scan_counts(t or "")
        return out
