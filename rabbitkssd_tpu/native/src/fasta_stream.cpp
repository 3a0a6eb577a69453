// Stateful chunked FASTA/FASTQ(.gz) -> 2-bit code streaming.
//
// Handle-based variant of fasta_codes.cpp for multi-GB inputs (the
// mammal/metagenome configs): the caller pulls bounded chunks of the
// code tape instead of materializing whole files — the streaming role
// of the RabbitFX chunked producer (/root/reference/src/sketch.cpp:
// 396-410).  FASTA records stream straight through; FASTQ records are
// staged per record so the trailing quality section can invalidate
// low-quality bases (reference sketch.cpp:795) before emission (reads
// are short, so staging is cheap).
//
// Semantics identical to kssd_fasta_codes: BaseMap 2-bit codes, -1 for
// invalid, one -1 separator between records, no trailing separator.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

int8_t BASE_MAP2[256];
struct MapInit2 {
    MapInit2() {
        memset(BASE_MAP2, -1, sizeof BASE_MAP2);
        BASE_MAP2['A'] = BASE_MAP2['a'] = 0;
        BASE_MAP2['C'] = BASE_MAP2['c'] = 1;
        BASE_MAP2['G'] = BASE_MAP2['g'] = 2;
        BASE_MAP2['T'] = BASE_MAP2['t'] = 3;
    }
} map_init2;

constexpr int RCHUNK = 1 << 20;

struct Reader {
    gzFile f = nullptr;
    int least_qual = 0;
    // raw input buffer
    char *buf = nullptr;
    int buf_len = 0;
    int buf_pos = 0;
    bool eof = false;
    // parser state
    bool any_record = false;
    bool in_record = false;
    bool in_qual = false;
    bool is_fastq_record = false;
    bool at_line_start = true;
    int line_kind = 0;
    int64_t seq_len = 0;
    int64_t qual_len = 0;
    std::vector<int8_t> staged;  // current fastq record's codes
    // pending output not yet taken by the caller
    std::vector<int8_t> carry;
    int64_t carry_pos = 0;
};

bool refill(Reader *r) {
    if (r->eof) return false;
    r->buf_len = gzread(r->f, r->buf, RCHUNK);
    r->buf_pos = 0;
    if (r->buf_len <= 0) {
        r->eof = true;
        return false;
    }
    return true;
}

}  // namespace

extern "C" {

void *kssd_fasta_open(const char *path, int least_qual) {
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    gzbuffer(f, 1 << 20);
    auto *r = new Reader();
    r->f = f;
    r->least_qual = least_qual;
    r->buf = static_cast<char *>(malloc(RCHUNK));
    return r;
}

void kssd_fasta_close(void *h) {
    auto *r = static_cast<Reader *>(h);
    if (!r) return;
    gzclose(r->f);
    free(r->buf);
    delete r;
}

// Fill out[0..cap) with the next codes; returns count (0 = EOF).
int64_t kssd_fasta_read_codes(void *h, int8_t *out, int64_t cap) {
    auto *r = static_cast<Reader *>(h);
    int64_t n = 0;

    auto emit = [&](int8_t code) -> bool {
        if (n < cap) {
            out[n++] = code;
            return true;
        }
        r->carry.push_back(code);
        return true;
    };

    // drain carry from a previous call first
    while (n < cap && r->carry_pos < (int64_t)r->carry.size()) {
        out[n++] = r->carry[r->carry_pos++];
    }
    if (r->carry_pos >= (int64_t)r->carry.size()) {
        r->carry.clear();
        r->carry_pos = 0;
    }

    while (n < cap) {
        if (r->buf_pos >= r->buf_len && !refill(r)) break;
        unsigned char ch = r->buf[r->buf_pos++];
        if (ch == '\n') { r->at_line_start = true; continue; }
        if (ch == '\r') continue;
        if (r->at_line_start) {
            r->at_line_start = false;
            if (r->in_qual && r->qual_len >= r->seq_len) {
                // quality already complete (e.g. empty record): close it
                r->in_qual = false;
                r->in_record = false;
                for (int8_t c : r->staged) emit(c);
                r->staged.clear();
            }
            if (r->in_qual) {
                r->line_kind = 0;
            } else if (ch == '>' || ch == '@') {
                r->line_kind = 1;
                if (r->any_record) emit(-1);  // record separator
                r->any_record = true;
                r->in_record = true;
                r->is_fastq_record = (ch == '@');
                r->seq_len = 0;
                r->staged.clear();
                continue;
            } else if (ch == '+' && r->in_record && !r->in_qual) {
                // kseq semantics: '+' starts quality for any record
                // type; for streamed '>' records the bases are already
                // emitted so quality can only be consumed, not applied
                r->line_kind = 2;
                r->in_qual = true;
                r->qual_len = 0;
                continue;
            } else {
                r->line_kind = 0;
            }
        }
        if (r->line_kind == 1 || r->line_kind == 2) continue;
        if (!r->in_record) continue;
        if (r->in_qual) {
            if (r->qual_len < (int64_t)r->staged.size()) {
                if (ch < (unsigned char)r->least_qual)
                    r->staged[r->qual_len] = -1;
            }
            ++r->qual_len;
            if (r->qual_len >= r->seq_len) {
                r->in_qual = false;
                r->in_record = false;
                for (int8_t c : r->staged) emit(c);
                r->staged.clear();
            }
        } else if (r->is_fastq_record) {
            r->staged.push_back(BASE_MAP2[ch]);
            ++r->seq_len;
        } else {
            emit(BASE_MAP2[ch]);
            ++r->seq_len;
        }
    }
    // EOF with staged bases (missing or partial quality): flush —
    // kseq keeps such records (partial quality applied as far as read)
    if (n < cap && r->eof && r->buf_pos >= r->buf_len
        && !r->staged.empty()) {
        for (int8_t c : r->staged) {
            if (n < cap) out[n++] = c;
            else r->carry.push_back(c);
        }
        r->staged.clear();
        r->in_record = false;
        r->in_qual = false;
    }
    return n;
}

}  // extern "C"
