// Streaming FASTA/FASTQ(.gz) -> 2-bit base-code tape.
//
// Native replacement for the Python record parser + encode_concat on the
// sketching hot path — the role RabbitFX/kseq play in the reference
// (/root/reference/src/sketch.cpp:14-17, 401-410).  Parses records
// (multi-line FASTA, multi-line FASTQ with '+' quality sections), maps
// bases via the BaseMap table (A/a=0, C/c=1, G/g=2, T/t=3, else -1;
// reference common.h:27-37), applies the FASTQ quality threshold
// (quality byte < least_qual -> invalid, reference sketch.cpp:795), and
// separates records with a single -1 sentinel so k-mer windows never
// span records.
//
// Output buffer is malloc'd here; the caller frees with kssd_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

namespace {

int8_t BASE_MAP[256];

struct MapInit {
    MapInit() {
        memset(BASE_MAP, -1, sizeof BASE_MAP);
        BASE_MAP['A'] = BASE_MAP['a'] = 0;
        BASE_MAP['C'] = BASE_MAP['c'] = 1;
        BASE_MAP['G'] = BASE_MAP['g'] = 2;
        BASE_MAP['T'] = BASE_MAP['t'] = 3;
    }
} map_init;

struct Buf {
    int8_t *data = nullptr;
    int64_t len = 0;
    int64_t cap = 0;
    bool grow(int64_t need) {
        if (len + need <= cap) return true;
        int64_t ncap = cap ? cap : (1 << 20);
        while (ncap < len + need) ncap *= 2;
        auto *nd = static_cast<int8_t *>(realloc(data, ncap));
        if (!nd) return false;
        data = nd;
        cap = ncap;
        return true;
    }
};

}  // namespace

extern "C" {

void kssd_free(void *p) { free(p); }

// Returns 0 on success. *out_codes/*out_len: the code tape.
int kssd_fasta_codes(const char *path, int least_qual, int8_t **out_codes,
                     int64_t *out_len) {
    *out_codes = nullptr;
    *out_len = 0;
    gzFile f = gzopen(path, "rb");
    if (!f) return 1;
    gzbuffer(f, 1 << 20);

    Buf out;
    // parser state
    bool any_record = false;
    bool in_record = false;
    bool in_qual = false;
    int64_t seq_len = 0;     // bases of current record emitted
    int64_t seq_start = 0;   // offset in out.data of current record
    int64_t qual_len = 0;

    constexpr int CHUNK = 1 << 20;
    char *buf = static_cast<char *>(malloc(CHUNK));
    if (!buf) { gzclose(f); return 2; }
    bool at_line_start = true;
    int line_kind = 0;  // 0 seq, 1 header, 2 plus(quality intro)

    int n;
    while ((n = gzread(f, buf, CHUNK)) > 0) {
        for (int i = 0; i < n; ++i) {
            unsigned char ch = buf[i];
            if (ch == '\n') { at_line_start = true; continue; }
            if (ch == '\r') continue;
            if (at_line_start) {
                at_line_start = false;
                if (in_qual && qual_len >= seq_len) {
                    // quality already complete (e.g. empty record):
                    // close it and reprocess this char as a fresh line
                    in_qual = false;
                    in_record = false;
                }
                if (in_qual) {
                    line_kind = 0;  // quality data line
                } else if (ch == '>' || ch == '@') {
                    line_kind = 1;
                    if (any_record) {  // one separator per record boundary
                        if (!out.grow(1)) { free(buf); gzclose(f); return 2; }
                        out.data[out.len++] = -1;
                    }
                    any_record = true;
                    in_record = true;
                    seq_len = 0;
                    seq_start = out.len;
                    continue;
                } else if (ch == '+' && in_record && !in_qual) {
                    line_kind = 2;
                    in_qual = true;
                    qual_len = 0;
                    continue;
                } else {
                    line_kind = 0;
                }
            }
            if (line_kind == 1 || line_kind == 2) continue;  // skip rest of line
            if (!in_record) continue;
            if (in_qual) {
                // quality byte for base at seq_start + qual_len
                if (qual_len < seq_len) {
                    if (ch < (unsigned char)least_qual)
                        out.data[seq_start + qual_len] = -1;
                }
                ++qual_len;
                if (qual_len >= seq_len) {
                    in_qual = false;
                    in_record = false;
                }
            } else {
                if (!out.grow(1)) { free(buf); gzclose(f); return 2; }
                out.data[out.len++] = BASE_MAP[ch];
                ++seq_len;
            }
        }
    }
    free(buf);
    gzclose(f);
    if (n < 0) { free(out.data); return 3; }
    *out_codes = out.data;
    *out_len = out.len;
    return 0;
}

}  // extern "C"
