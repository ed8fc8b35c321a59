"""Diploid/haploid assembly genotypers with exact reference semantics.

Counterpart of /root/reference/sam/{diploidBase,ancientDiploidBase,
diploidIndel,haploid}.go — the machinery behind the ancora assembler.
Numerics follow the reference bit-for-bit: FDLIBM log (numbers/gomath),
logspace Multiply/Pow, the likelihood caches' in-bounds expressions
(including the reference's cached-vs-uncached heterozygous base, which
uses log(0.5-eps) inside cache bounds and log(0.5-eps/3) outside,
diploidBase.go:239-252), and a Go-rand draw on EVERY call's tie list
(numbers.RandIntInRange consumes one Float64 even for singletons).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from . import dna
from .numbers.gomath import go_log
from .numbers.logspace import multiply as ls_mul, pow_ as ls_pow
from .pileup import Pile

(AA, AC, AG, AT, CC, CG, CT, GG, GT, TT, NN) = range(11)

# insertion / deletion genotype states (diploidIndel.go:17-21, 156-161)
IA_IA, IA_IB, IA_B, BB_NO_INS = 0, 1, 2, 3
DA_DA, DA_DB, DA_B, BB_NO_DEL = 0, 1, 2, 3

_GENO_BASES = {AA: (dna.A, dna.A), AC: (dna.A, dna.C), AG: (dna.A, dna.G),
               AT: (dna.A, dna.T), CC: (dna.C, dna.C), CG: (dna.C, dna.G),
               CT: (dna.C, dna.T), GG: (dna.G, dna.G), GT: (dna.G, dna.T),
               TT: (dna.T, dna.T), NN: (dna.N, dna.N)}

_REF_GENO = {dna.A: AA, dna.C: CC, dna.G: GG, dna.T: TT, dna.N: NN}


def diploid_base_to_bases(geno: int) -> list[int]:
    b = _GENO_BASES[geno]
    return [b[0], b[1]]


def ref_base_to_ref_genotype(ref: int) -> int:
    return _REF_GENO[ref]


@dataclass
class Caches:
    """CacheStruct (cmd/ancora/cache.go) with Go's exact cache-bounds
    behavior: a maximum dimension, 0 as the unset sentinel."""
    size: int = 100
    homo_base: dict = field(default_factory=dict)
    hetero_base: dict = field(default_factory=dict)
    homo_indel: dict = field(default_factory=dict)
    hetero_indel: dict = field(default_factory=dict)
    ancient: dict = field(default_factory=dict)


def _homozygous_expr(correct: int, incorrect: int, eps: float,
                     cache: Caches) -> float:
    # identical in and out of cache bounds (diploidBase.go:217)
    return ls_mul(ls_pow(go_log(1.0 - eps), float(correct)),
                  ls_pow(go_log(eps / 3.0), float(incorrect)))


def _heterozygous_expr(correct: int, incorrect: int, eps: float,
                       cache: Caches) -> float:
    # IN cache bounds: log(0.5 - eps); outside: log(0.5 - eps/3)
    # (diploidBase.go:239-252 — the reference's two branches differ)
    if correct < cache.size and incorrect < cache.size:
        s = ls_pow(go_log(0.5 - eps), float(correct))
    else:
        s = ls_pow(go_log(0.5 - eps / 3.0), float(correct))
    return ls_mul(s, ls_pow(go_log(eps / 3.0), float(incorrect)))


def _homozygous_indel_expr(correct: int, incorrect: int, eps: float,
                           cache: Caches) -> float:
    return ls_mul(ls_pow(go_log(1.0 - eps), float(correct)),
                  ls_pow(go_log(eps / 2.0), float(incorrect)))


def _heterozygous_indel_expr(correct: int, incorrect: int, eps: float,
                             cache: Caches) -> float:
    return ls_mul(ls_pow(go_log(0.5 - eps / 4.0), float(correct)),
                  ls_pow(go_log(eps / 2.0), float(incorrect)))


def base_likelihood(a: int, c: int, g: int, t: int, geno: int, eps: float,
                    cache: Caches) -> float:
    """baseLikelihood (diploidBase.go:186)."""
    if geno == AA:
        return _homozygous_expr(a, c + g + t, eps, cache)
    if geno == AC:
        return _heterozygous_expr(a + c, g + t, eps, cache)
    if geno == AG:
        return _heterozygous_expr(a + g, c + t, eps, cache)
    if geno == AT:
        return _heterozygous_expr(a + t, c + g, eps, cache)
    if geno == CC:
        return _homozygous_expr(c, a + g + t, eps, cache)
    if geno == CG:
        return _heterozygous_expr(c + g, a + t, eps, cache)
    if geno == CT:
        return _heterozygous_expr(c + t, a + g, eps, cache)
    if geno == GG:
        return _homozygous_expr(g, a + c + t, eps, cache)
    if geno == GT:
        return _heterozygous_expr(g + t, a + c, eps, cache)
    if geno == TT:
        return _homozygous_expr(t, a + c + g, eps, cache)
    raise ValueError(f"Genotype unknown. Found: {geno}.")


def ancient_base_likelihood(a: int, c: int, g: int, t: int, geno: int,
                            eps: float, lam: float) -> float:
    """ancientBaseLikelihood (ancientDiploidBase.go:28)."""
    def p(logx, n):
        return ls_pow(logx, float(n))

    e3 = go_log(eps / 3.0)
    ome = go_log(1.0 - eps)
    omel = go_log(1.0 - eps - lam)
    e3l = go_log(eps / 3.0 + lam)
    h = go_log(0.5 - eps / 3.0)
    e3l2 = go_log(eps / 3.0 + lam / 2.0)
    hpl2 = go_log(0.5 - eps / 3.0 + lam / 2.0)
    hml2 = go_log(0.5 - eps / 3.0 - lam / 2.0)
    t1 = t2 = t3 = t4 = 0.0
    if geno == AA:
        t1, t2 = p(e3, c + g + t), p(ome, a)
    elif geno == AC:
        t1, t2, t3, t4 = p(h, a), p(hml2, c), p(e3, g), p(e3l2, t)
    elif geno == AG:
        t1, t2, t3 = p(hpl2, a), p(e3, c + t), p(hml2, g)
    elif geno == AT:
        t1, t2 = p(h, a + t), p(e3, c + g)
    elif geno == CC:
        t1, t2, t3 = p(e3, a + g), p(omel, c), p(e3l, t)
    elif geno == CG:
        t1, t2, t3 = p(e3l2, a), p(hml2, c + g), p(e3l2, t)
    elif geno == CT:
        t1, t2, t3 = p(e3, a + g), p(hml2, c), p(hpl2, t)
    elif geno == GG:
        t1, t2, t3 = p(e3l, a), p(e3, c + t), p(omel, g)
    elif geno == GT:
        t1, t2, t3, t4 = p(e3l2, a), p(e3, c), p(hml2, g), p(h, t)
    elif geno == TT:
        t1, t2 = p(e3, a + c + g), p(ome, t)
    else:
        raise ValueError(f"Unknown genotype: {geno}.")
    return ls_mul(t1, ls_mul(t2, ls_mul(t3, t4)))


def _counts(p: Pile):
    return (int(p.count_f[dna.A] + p.count_r[dna.A]),
            int(p.count_f[dna.C] + p.count_r[dna.C]),
            int(p.count_f[dna.G] + p.count_r[dna.G]),
            int(p.count_f[dna.T] + p.count_r[dna.T]))


def _rand_int_in_range(rng, x: int, y: int) -> int:
    """numbers.RandIntInRange (random.go:9): consumes one Float64."""
    return int(rng.float64() * (y - x)) + x


def diploid_base_call_from_pile(p: Pile, ref_base: int, prior_cache,
                                cache: Caches, eps: float, lam: float,
                                rng) -> int:
    """DiploidBaseCallFromPile (diploidBase.go:114). rng: gorand.GoRand —
    one Float64 is consumed per call with base coverage (tie pick)."""
    if ref_base == dna.N:
        return NN
    a, c, g, t = _counts(p)
    if a + c + g + t < 1:
        return ref_base_to_ref_genotype(ref_base)

    def like(geno):
        if lam > 0:
            return ancient_base_likelihood(a, c, g, t, geno, eps, lam)
        return base_likelihood(a, c, g, t, geno, eps, cache)

    hom = ref_base_to_ref_genotype(ref_base)
    max_list = [hom]
    max_post = ls_mul(like(hom), prior_cache[ref_base][hom])
    for geno in range(10):
        cur = ls_mul(like(geno), prior_cache[ref_base][geno])
        if cur > max_post:
            max_post = cur
            max_list = [geno]
        elif cur == max_post:
            max_list.append(geno)
    return max_list[_rand_int_in_range(rng, 0, len(max_list))]


def _merged_indel_map(f: dict, r: dict):
    """Merge forward/reverse indel observation maps. The reference
    iterates Go maps (random order); insertion order here."""
    tot = 0
    merged: dict = {}
    for k, v in f.items():
        tot += v
        merged[k] = v
    for k, v in r.items():
        tot += v
        merged[k] = merged.get(k, 0) + v
    return merged, tot


def _top_two(merged: dict, zero):
    ka, va = zero, 0
    kb, vb = zero, 0
    for k, v in merged.items():
        if v > va:
            kb, vb = ka, va
            ka, va = k, v
        elif v > vb:
            kb, vb = k, v
    return ka, va, kb, vb


@dataclass
class DiploidInsertion:
    type: int = BB_NO_INS
    ia: str = ""
    ib: str = ""


def diploid_insertion_to_seqs(i: DiploidInsertion):
    if i.type == IA_IA:
        return [dna.from_string(i.ia), dna.from_string(i.ia)]
    if i.type == IA_IB:
        return [dna.from_string(i.ia), dna.from_string(i.ib)]
    if i.type == IA_B:
        return [dna.from_string(i.ia), dna.from_string("")]
    return [dna.from_string(""), dna.from_string("")]


def diploid_insertion_call_from_pile(p: Pile, prior_cache, cache: Caches,
                                     eps: float, rng) -> DiploidInsertion:
    """DiploidInsertionCallFromPile (diploidIndel.go:67)."""
    a, c, g, t = _counts(p)
    n_count = int(p.count_f[dna.N] + p.count_r[dna.N])
    n = a + c + g + t + n_count
    merged, i_tot = _merged_indel_map(p.ins_count_f, p.ins_count_r)
    ia_key, ia_val, ib_key, ib_val = _top_two(merged, "")
    if ia_val < 1:
        return DiploidInsertion(BB_NO_INS, "", "")
    b = n - i_tot
    answer = [DiploidInsertion(BB_NO_INS, ia_key, ib_key)]
    best = ls_mul(_homozygous_indel_expr(b, ia_val + ib_val, eps, cache),
                  prior_cache[BB_NO_INS])
    for typ, post in (
            (IA_IA, ls_mul(_homozygous_indel_expr(ia_val, b + ib_val, eps,
                                                  cache),
                           prior_cache[IA_IA])),
            (IA_IB, ls_mul(_heterozygous_indel_expr(ia_val + ib_val, b,
                                                    eps, cache),
                           prior_cache[IA_IB])),
            (IA_B, ls_mul(_heterozygous_indel_expr(ia_val + b, ib_val,
                                                   eps, cache),
                          prior_cache[IA_B]))):
        if post > best:
            answer = [DiploidInsertion(typ, ia_key, ib_key)]
            best = post
        elif post == best:
            answer.append(DiploidInsertion(typ, ia_key, ib_key))
    return answer[_rand_int_in_range(rng, 0, len(answer))]


@dataclass
class DiploidDeletion:
    type: int = BB_NO_DEL
    da: int = 0
    db: int = 0


def diploid_deletion_call_from_pile(p: Pile, prior_cache, cache: Caches,
                                    eps: float, rng) -> DiploidDeletion:
    """DiploidDeletionCallFromPile (diploidIndel.go:189)."""
    a, c, g, t = _counts(p)
    n = a + c + g + t
    merged, d_tot = _merged_indel_map(p.del_count_f, p.del_count_r)
    da_key, da_val, db_key, db_val = _top_two(merged, 0)
    if da_val < 1:
        return DiploidDeletion(BB_NO_DEL, 0, 0)
    b = max(n - d_tot, 0)
    answer = [DiploidDeletion(BB_NO_DEL, da_key, db_key)]
    best = ls_mul(_homozygous_indel_expr(b, da_val + db_val, eps, cache),
                  prior_cache[BB_NO_DEL])
    for typ, post in (
            (DA_DA, ls_mul(_homozygous_indel_expr(da_val, b + db_val, eps,
                                                  cache),
                           prior_cache[DA_DA])),
            (DA_DB, ls_mul(_heterozygous_indel_expr(da_val + db_val, b,
                                                    eps, cache),
                           prior_cache[DA_DB])),
            (DA_B, ls_mul(_heterozygous_indel_expr(da_val + b, db_val,
                                                   eps, cache),
                          prior_cache[DA_B]))):
        if post > best:
            answer = [DiploidDeletion(typ, da_key, db_key)]
            best = post
        elif post == best:
            answer.append(DiploidDeletion(typ, da_key, db_key))
    return answer[_rand_int_in_range(rng, 0, len(answer))]


@dataclass
class HaploidCall:
    base: int = dna.N
    insertion: str = ""
    deletion: int = 0


def haploid_call_from_pile(p: Pile, ref_base: int, eps: float, lam: float,
                           base_prior, indel_prior, cache: Caches,
                           rng) -> HaploidCall:
    """HaploidCallFromPile (haploid.go:21)."""
    answer = HaploidCall(base=ref_base, insertion="", deletion=0)
    a, c, g, t = _counts(p)
    n_count = int(p.count_f[dna.N] + p.count_r[dna.N])
    n = a + c + g + t + n_count

    if ref_base != dna.N:
        def like(geno):
            if lam > 0:
                return ancient_base_likelihood(a, c, g, t, geno, eps, lam)
            return base_likelihood(a, c, g, t, geno, eps, cache)

        homs = [AA, CC, GG, TT]
        max_bases = [dna.A]
        max_post = ls_mul(like(AA), base_prior[ref_base][dna.A])
        for bb in (dna.C, dna.G, dna.T):
            cur = ls_mul(like(homs[bb]), base_prior[ref_base][bb])
            if cur > max_post:
                max_bases = [bb]
                max_post = cur
            elif cur == max_post:
                max_bases.append(bb)
        answer.base = max_bases[_rand_int_in_range(rng, 0,
                                                   len(max_bases))]

    merged, i_tot = _merged_indel_map(p.ins_count_f, p.ins_count_r)
    ia_key, ia_val = "", 0
    for k, v in merged.items():
        if v > ia_val:
            ia_key, ia_val = k, v
    b = n - i_tot
    if ia_val > 0:
        no_ins = ls_mul(_homozygous_indel_expr(b, ia_val, eps, cache),
                        indel_prior[0])
        ins = ls_mul(_homozygous_indel_expr(ia_val, b, eps, cache),
                     indel_prior[1])
        if ins > no_ins:
            answer.insertion = ia_key

    merged_d, _d_tot = _merged_indel_map(p.del_count_f, p.del_count_r)
    da_key, da_val = 0, 0
    for k, v in merged_d.items():
        if v > da_val:
            da_key, da_val = k, v
    # the reference reuses B = N - iTot for the deletion comparison too
    # (haploid.go:137: "B = N - iTot")
    if da_val > 0:
        no_del = ls_mul(_homozygous_indel_expr(b, da_val, eps, cache),
                        indel_prior[0])
        dele = ls_mul(_homozygous_indel_expr(da_val, b, eps, cache),
                      indel_prior[1])
        if dele > no_del:
            answer.deletion = da_key
    return answer


# ---------------------------------------------------------------------------
# prior caches (diploidBase.go:254-360, diploidIndel.go:311, haploid.go:153)
# ---------------------------------------------------------------------------

def make_diploid_base_prior_cache(delta: float, gamma: float):
    tv = delta / (2.0 + gamma)
    tr = gamma * tv
    omd2 = go_log(math.pow(1 - delta, 2))
    tv2 = go_log(tv * tv)
    tr2 = go_log(tr * tr)
    tvtr = go_log(tv * tr)
    two_tv2 = go_log(2 * tv * tv)
    two_omd_tv = go_log(2 * (1 - delta) * tv)
    two_omd_tr = go_log(2 * (1 - delta) * tr)
    return [
        [omd2, two_omd_tv, two_omd_tr, two_omd_tv, tv2, tvtr, two_tv2,
         tr2, tvtr, tv2],
        [tv2, two_omd_tv, two_tv2, tvtr, omd2, two_omd_tv, two_omd_tr,
         tv2, tvtr, tr2],
        [tr2, tvtr, two_omd_tr, tvtr, tv2, two_omd_tv, two_tv2, omd2,
         two_omd_tv, tv2],
        [tv2, tvtr, two_tv2, two_omd_tv, tr2, tvtr, two_omd_tr, two_tv2,
         two_omd_tv, omd2]]


def make_diploid_base_flat_prior_cache():
    v = go_log(0.1)
    return [[v] * 10 for _ in range(4)]


def make_diploid_base_empirical_prior_cache(in_file: str):
    """MakeDiploidBaseEmpiricalPriorCache (diploidBase.go:280): returns
    (4x10 log prior, epsilon, lambda)."""
    from . import fileio

    lines = fileio.read(in_file)
    if len(lines) != 7:
        raise SystemExit(f"expected seven lines in empirical prior file. "
                         f"Found: {len(lines)}.")
    eps = float(lines[0].split("\t")[1])
    lam = float(lines[1].split("\t")[1])
    out = []
    for row in lines[3:7]:
        w = row.split("\t")
        if len(w) != 11:
            raise SystemExit("expected 11 fields in empirical prior row")
        # the reference stores these RAW (not log-transformed), unlike
        # every other prior cache — kept for parity (diploidBase.go:280)
        out.append([float(x) for x in w[1:11]])
    return out, eps, lam


def make_diploid_indel_prior_cache(kappa: float, delta: float):
    """MakeDiploidIndelPriorCache (diploidIndel.go:311), quirks intact:
    the IaB prior is 2 + log(kappa*delta) (a raw 2, not log 2)."""
    kd = ls_mul(go_log(kappa), go_log(delta))
    kd2 = ls_pow(kd, 2)
    p_bb = go_log(1 - 4 * kappa * delta - 3 * (kappa * kappa * delta
                                               * delta))
    return [kd2, ls_mul(go_log(2), kd2), ls_mul(2, kd), p_bb]


def make_haploid_base_prior_cache(delta: float, gamma: float):
    tv = go_log(delta / (2.0 + gamma))
    tr = go_log(gamma * delta / (2.0 + gamma))
    omd = go_log(1.0 - delta)
    return [[omd, tv, tr, tv], [tv, omd, tv, tr], [tr, tv, omd, tv],
            [tv, tr, tv, omd]]


def make_haploid_indel_prior_cache(delta: float, kappa: float):
    return [go_log(1.0 - delta * kappa), go_log(delta * kappa)]
