// bath_tpu native host runtime: sequence digitization, reverse
// complement, six-frame ORF extraction, and frame translation.
//
// This is the TPU framework's host-side data loader (the role Easel's
// esl_sqio/esl_gencode C code plays in the reference, ref:
// bathsearch.c:385-392 ProcessStart/Piece/End usage): the hot
// per-nucleotide loops that feed window batches to the device.
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).
//
// Digital alphabet conventions match bath_tpu.alphabet (Easel order):
//   DNA: 0..3 ACGT, 4 gap, 5..14 degenerate, 15 N(any)=Kp-3,
//        16 '*', 17 '~'  (Kp=18)
//   amino: 0..19, ..., 26 '*'(stop)=Kp-2, X=Kp-3=25? (Kp=29: X=26? see
//   python: sym "ACDEFGHIKLMNPQRSTVWY-BJZOUX*~": X at 26, '*' 27, '~' 28)

#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

// --- DNA digitization ------------------------------------------------
// table: 256 int8 entries, -1 = invalid.  Returns count of invalid.
int bio_digitize(const char* text, int64_t n, const int8_t* table,
                 int32_t* out) {
    int bad = 0;
    for (int64_t i = 0; i < n; i++) {
        int8_t v = table[(uint8_t)text[i]];
        if (v < 0) { bad++; v = 15; }
        out[i] = v;
    }
    return bad;
}

// --- reverse complement ---------------------------------------------
// comp: Kp int32 complement map
void bio_revcomp(const int32_t* dsq, int64_t n, const int32_t* comp,
                 int32_t* out) {
    for (int64_t i = 0; i < n; i++)
        out[i] = comp[dsq[n - 1 - i]];
}

// --- degenerate-aware codon translation ------------------------------
// basic:  [64] canonical codon -> amino (stop = stop_code)
// masks:  [Kp_dna] 4-bit mask of compatible canonical nucleotides
//         (0 for gap/nonres/missing)
// any_aa: the 'X' amino code
static inline int translate_codon(int x1, int x2, int x3,
                                  const int32_t* basic,
                                  const uint8_t* masks, int any_aa) {
    if (x1 < 4 && x2 < 4 && x3 < 4)
        return basic[16 * x1 + 4 * x2 + x3];
    uint8_t m1 = masks[x1], m2 = masks[x2], m3 = masks[x3];
    if (!m1 || !m2 || !m3) return any_aa;
    int aa = -1;
    for (int a = 0; a < 4; a++) {
        if (!(m1 & (1 << a))) continue;
        for (int b = 0; b < 4; b++) {
            if (!(m2 & (1 << b))) continue;
            for (int c = 0; c < 4; c++) {
                if (!(m3 & (1 << c))) continue;
                int v = basic[16 * a + 4 * b + c];
                if (aa == -1) aa = v;
                else if (aa != v) return any_aa;
            }
        }
    }
    return aa < 0 ? any_aa : aa;
}

// --- six-frame ORF extraction ---------------------------------------
// Walk codons in end-position order with frames interleaved (matching
// esl_gencode ProcessPiece, ref: bathsearch.c:385); an ORF closes at
// its stop codon; open ORFs flush at the end in frame order.
//
// Outputs:
//   aa_out   caller buffer >= L ints: concatenated ORF aminos
//   meta_out caller buffer >= 4*(L/3+3) ints: per ORF
//            (start, end, frame, len); aa offsets are cumulative.
// Returns number of ORFs.
int bio_extract_orfs(const int32_t* dsq, int64_t L,
                     const int32_t* basic, const uint8_t* masks,
                     const uint8_t* is_init, int stop_code, int any_aa,
                     int minlen, int require_init, int is_revcomp,
                     int32_t* aa_out, int32_t* meta_out) {
    int norf = 0;
    int64_t aa_pos = 0;
    // per-frame open-ORF state
    int64_t fstart[3] = {0, 0, 0};
    int64_t fbegin[3] = {0, 0, 0};   // index into aa_out
    int64_t flen[3] = {0, 0, 0};
    bool fin[3] = {false, false, false};
    // each frame appends into its own region?  We must buffer per
    // frame because frames interleave.  Use separate scratch heads:
    // allocate on the fly into aa_out is unsafe when interleaved, so
    // buffer per frame in stack-allocated growing chunks is complex;
    // instead do two passes: frame-sequential emission but record
    // ORFs in codon-end order.  Simpler: per-frame temporary buffers.
    static thread_local int32_t* tmp[3] = {nullptr, nullptr, nullptr};
    static thread_local int64_t tmpcap[3] = {0, 0, 0};
    for (int f = 0; f < 3; f++) {
        int64_t need = L / 3 + 2;
        if (tmpcap[f] < need) {
            delete[] tmp[f];
            tmp[f] = new int32_t[need];
            tmpcap[f] = need;
        }
    }

    auto finish = [&](int f, int64_t apos_last) {
        if (fin[f] && flen[f] >= minlen) {
            int64_t s = fstart[f], e = apos_last;
            if (is_revcomp) { s = L - s + 1; e = L - e + 1; }
            memcpy(aa_out + aa_pos, tmp[f], flen[f] * sizeof(int32_t));
            meta_out[4 * norf + 0] = (int32_t)s;
            meta_out[4 * norf + 1] = (int32_t)e;
            meta_out[4 * norf + 2] = f;
            meta_out[4 * norf + 3] = (int32_t)flen[f];
            aa_pos += flen[f];
            norf++;
        }
        flen[f] = 0;
        fin[f] = false;
    };

    for (int64_t e = 3; e <= L; e++) {
        int f = (int)(e % 3);
        int x1 = dsq[e - 3], x2 = dsq[e - 2], x3 = dsq[e - 1];
        bool canonical = x1 < 4 && x2 < 4 && x3 < 4;
        int aa = canonical ? basic[16 * x1 + 4 * x2 + x3]
                           : translate_codon(x1, x2, x3, basic, masks,
                                             any_aa);
        if (aa == stop_code) {
            finish(f, e - 3);
        } else if (!fin[f]) {
            bool ok = true;
            if (require_init)
                ok = canonical && is_init[16 * x1 + 4 * x2 + x3];
            if (ok) {
                fin[f] = true;
                fstart[f] = e - 2;
                tmp[f][0] = aa;
                flen[f] = 1;
            }
        } else {
            tmp[f][flen[f]++] = aa;
        }
    }
    for (int f = 0; f < 3; f++) {
        int64_t e_last = L - ((L - f) % 3);
        finish(f, e_last);
    }
    return norf;
}

// --- frame translation (for bias filter / display) -------------------
void bio_translate_frame(const int32_t* dsq, int64_t L, int frame,
                         const int32_t* basic, const uint8_t* masks,
                         int any_aa, int32_t* out, int64_t* out_n) {
    int64_t n = 0;
    for (int64_t i = frame; i + 3 <= L; i += 3)
        out[n++] = translate_codon(dsq[i], dsq[i + 1], dsq[i + 2],
                                   basic, masks, any_aa);
    *out_n = n;
}

}  // extern "C"
