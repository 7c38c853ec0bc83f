"""Python twin of tools/ScaleUp's keyed alphabet permutation (round 9).

ScaleUp replica k >= 1 transforms documents.text with a per-replica
bijection on letters and digits drawn from a splitmix64-seeded
Fisher-Yates stream with pairwise-low-agreement rejection (see the
ScaleUp Scaladoc for the soundness argument). The replica oracles in
scaleup_parity.py must apply the IDENTICAL transform, so this module
reimplements it bit-for-bit (64-bit wrap-around via masking);
ScaleUpSpec pins both sides to the same literal tables.
"""

M64 = (1 << 64) - 1

MAX_LETTER_AGREE = 6
MAX_DIGIT_AGREE = 3
# Round 13 (VERDICT r12 #6, factor-1000 audit): digit rows >= 100 relax
# to <= 4 of 10 — at ~1000 priors the <= 3 bound is unsatisfiable in
# bounded attempts (P(candidate passes all priors) ~ 4e-9), while <= 4
# passes with worst observed attempt 586 of the 1000 cap. Rows < 100
# keep the r9 bound, so every factor-<=100 corpus byte is unchanged.
MAX_DIGIT_AGREE_HIGH = 4
MAX_REPLICAS = 1000
LETTER_SALT = 0x5CA1E7
DIGIT_SALT = 0xD1617


def letter_agree_for(k):
    return MAX_LETTER_AGREE


def digit_agree_for(k):
    return MAX_DIGIT_AGREE if k < 100 else MAX_DIGIT_AGREE_HIGH


def mix64(z):
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def fisher_yates(n, salt, attempt):
    a = list(range(n))
    s = mix64((salt * 1000003 + attempt) & M64)
    for i in range(n - 1, 0, -1):
        s = mix64(s)
        j = (s >> 33) % (i + 1)
        a[i], a[j] = a[j], a[i]
    return a


def agree(a, b):
    return sum(1 for x, y in zip(a, b) if x == y)


def _extend_table(rows, n, factor, salt, max_agree_fn):
    """Grow `rows` in place to `factor` entries. Construction is
    sequential (row k rejects only against rows < k), so extension is
    PREFIX-STABLE: the first 100 rows of the 1000-row table are
    bit-identical to the shipped 100-row table."""
    for k in range(len(rows), factor):
        attempt = 0
        cand = fisher_yates(n, salt + k, attempt)
        while any(agree(r, cand) > max_agree_fn(k) for r in rows):
            attempt += 1
            assert attempt < 1000, f"rejection runaway at k={k}"
            cand = fisher_yates(n, salt + k, attempt)
        rows.append(cand)
    return rows


def perm_table(n, factor, salt, max_agree_fn):
    if not callable(max_agree_fn):  # legacy constant-bound callers
        bound = max_agree_fn
        max_agree_fn = lambda k: bound  # noqa: E731
    return _extend_table([list(range(n))], n, factor, salt, max_agree_fn)


LETTER_PERMS = perm_table(26, 100, LETTER_SALT, letter_agree_for)
DIGIT_PERMS = perm_table(10, 100, DIGIT_SALT, digit_agree_for)


def ensure_replicas(factor):
    """Extend both tables to `factor` rows (<= MAX_REPLICAS). Tables
    start at 100 rows so import stays cheap for factor-<=100 runs."""
    assert factor <= MAX_REPLICAS, factor
    _extend_table(LETTER_PERMS, 26, factor, LETTER_SALT, letter_agree_for)
    _extend_table(DIGIT_PERMS, 10, factor, DIGIT_SALT, digit_agree_for)


def permute_text(s, k):
    """tools/ScaleUp.permuteText, reimplemented."""
    if k == 0 or not isinstance(s, str):
        return s
    if k >= len(LETTER_PERMS) or k >= len(DIGIT_PERMS):
        ensure_replicas(k + 1)
    lp, dp = LETTER_PERMS[k], DIGIT_PERMS[k]
    out = []
    for c in s:
        if "a" <= c <= "z":
            out.append(chr(97 + lp[ord(c) - 97]))
        elif "A" <= c <= "Z":
            out.append(chr(65 + lp[ord(c) - 65]))
        elif "0" <= c <= "9":
            out.append(chr(48 + dp[ord(c) - 48]))
        else:
            out.append(c)
    return "".join(out)


if __name__ == "__main__":
    print("letters k=1:", LETTER_PERMS[1])
    print("digits  k=1:", DIGIT_PERMS[1])
    print("letters k=99:", LETTER_PERMS[99])
    print("digits  k=99:", DIGIT_PERMS[99])
    worst_l = max(agree(LETTER_PERMS[i], LETTER_PERMS[j])
                  for i in range(100) for j in range(i + 1, 100))
    worst_d = max(agree(DIGIT_PERMS[i], DIGIT_PERMS[j])
                  for i in range(100) for j in range(i + 1, 100))
    print("worst pairwise agreement: letters", worst_l, "digits", worst_d)
    print("permute_text('Hello World 42', 1):", permute_text("Hello World 42", 1))
