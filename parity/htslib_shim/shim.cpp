// htslib API shim implementation — see htslib/sam.h for scope and intent.
//
// From-scratch C++ backing for the ~30 htslib symbols the reference
// consumes. BAM/BGZF/BAI/basemod semantics mirror pomfret_tpu's own stack
// (io/bgzf.py, io/bam.py, io/basemod.py, io/bam_writer.py, core/fisher.py),
// which in turn replicate htslib behavior — so the reference binary built
// against this shim is a faithful differential oracle.
//
// NOT copied from htslib (unavailable in this environment) nor from
// /root/reference; the only htslib-derived piece is the Fisher tail-walk
// ported from our own core/fisher.py (itself written to be
// decision-equivalent with htslib kfunc.c).

#include "htslib/sam.h"
#include "htslib/kfunc.h"

#include <zlib.h>
#include <math.h>
#include <stdio.h>

#include <algorithm>
#include <map>
#include <string>
#include <vector>

extern "C" {

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

// ===================================================================== BGZF

struct BlockEntry {
    uint64_t coffset;   // compressed offset of the block
    uint64_t poffset;   // cumulative plain offset
    uint32_t plen;      // plain length of the block
};

static bool inflate_bgzf_file(const char *fn, std::vector<uint8_t> &plain,
                              std::vector<BlockEntry> &blocks) {
    FILE *f = fopen(fn, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> comp((size_t)sz);
    if (sz > 0 && fread(comp.data(), 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        return false;
    }
    fclose(f);
    size_t p = 0;
    plain.clear();
    blocks.clear();
    while (p + 18 <= comp.size()) {
        if (comp[p] != 0x1f || comp[p + 1] != 0x8b) break;
        uint16_t xlen;
        memcpy(&xlen, &comp[p + 10], 2);
        // find BC subfield for BSIZE
        size_t xp = p + 12, xend = p + 12 + xlen;
        if (xend > comp.size()) break;
        uint32_t bsize = 0;
        while (xp + 4 <= xend) {
            uint8_t si1 = comp[xp], si2 = comp[xp + 1];
            uint16_t slen;
            memcpy(&slen, &comp[xp + 2], 2);
            if (si1 == 'B' && si2 == 'C' && slen == 2) {
                uint16_t bs;
                memcpy(&bs, &comp[xp + 4], 2);
                bsize = (uint32_t)bs + 1;
            }
            xp += 4 + slen;
        }
        if (bsize == 0 || p + bsize > comp.size()) break;
        uint32_t isize;
        memcpy(&isize, &comp[p + bsize - 4], 4);
        size_t out_off = plain.size();
        plain.resize(out_off + isize);
        if (isize > 0) {
            z_stream zs;
            memset(&zs, 0, sizeof(zs));
            if (inflateInit2(&zs, -15) != Z_OK) return false;
            zs.next_in = &comp[p + 12 + xlen];
            zs.avail_in = (uInt)(bsize - 12 - xlen - 8);
            zs.next_out = &plain[out_off];
            zs.avail_out = isize;
            int r = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (r != Z_STREAM_END) return false;
        }
        blocks.push_back({(uint64_t)p, (uint64_t)out_off, isize});
        p += bsize;
    }
    return !blocks.empty() || plain.empty();
}

// virtual offset -> plain offset (blocks sorted by coffset)
static int64_t voffset_to_plain(const std::vector<BlockEntry> &blocks,
                                uint64_t voff) {
    uint64_t coff = voff >> 16, within = voff & 0xFFFF;
    size_t lo = 0, hi = blocks.size();
    while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if (blocks[mid].coffset < coff) lo = mid + 1;
        else hi = mid;
    }
    if (lo >= blocks.size() || blocks[lo].coffset != coff) return -1;
    return (int64_t)(blocks[lo].poffset + within);
}

// plain offset -> virtual offset
static uint64_t plain_to_voffset(const std::vector<BlockEntry> &blocks,
                                 uint64_t poff) {
    size_t lo = 0, hi = blocks.size();
    while (lo < hi) {  // last block with poffset <= poff
        size_t mid = (lo + hi) / 2;
        if (blocks[mid].poffset <= poff) lo = mid + 1;
        else hi = mid;
    }
    if (lo == 0) return 0;
    const BlockEntry &b = blocks[lo - 1];
    uint64_t within = poff - b.poffset;
    if (within == b.plen && lo < blocks.size())  // block boundary: next block
        return blocks[lo].coffset << 16;
    return (b.coffset << 16) | within;
}

// =================================================================== reader

struct ShimReader {
    std::vector<uint8_t> plain;
    std::vector<BlockEntry> blocks;
    size_t data_start = 0;  // plain offset of the first record
    int header_parsed = 0;
};

// writer: plain bytes staged into 64KB BGZF blocks
struct shim_BGZF {
    FILE *f = nullptr;
    std::vector<uint8_t> buf;
    bool is_reader_dummy = false;
    static const size_t BLOCK = 0xFF00;

    void flush_block(const uint8_t *data, size_t n) {
        std::vector<uint8_t> out(n + n / 2 + 256);
        z_stream zs;
        memset(&zs, 0, sizeof(zs));
        deflateInit2(&zs, 6, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
        zs.next_in = const_cast<uint8_t *>(data);
        zs.avail_in = (uInt)n;
        zs.next_out = out.data();
        zs.avail_out = (uInt)out.size();
        deflate(&zs, Z_FINISH);
        size_t clen = out.size() - zs.avail_out;
        deflateEnd(&zs);
        uint32_t crc = crc32(0, data, (uInt)n);
        uint16_t bsize = (uint16_t)(clen + 25);  // total - 1
        uint8_t hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                           6, 0, 'B', 'C', 2, 0, 0, 0};
        memcpy(hdr + 16, &bsize, 2);
        fwrite(hdr, 1, 18, f);
        fwrite(out.data(), 1, clen, f);
        uint32_t isize = (uint32_t)n;
        fwrite(&crc, 4, 1, f);
        fwrite(&isize, 4, 1, f);
    }
    void write(const void *data, size_t n) {
        const uint8_t *d = (const uint8_t *)data;
        buf.insert(buf.end(), d, d + n);
        while (buf.size() >= BLOCK) {
            flush_block(buf.data(), BLOCK);
            buf.erase(buf.begin(), buf.begin() + BLOCK);
        }
    }
    void close() {
        if (!f) return;
        if (!buf.empty()) {
            flush_block(buf.data(), buf.size());
            buf.clear();
        }
        static const uint8_t EOF_BLK[28] = {
            0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
            0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
            0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00};
        fwrite(EOF_BLK, 1, 28, f);
        fclose(f);
        f = nullptr;
    }
};

BGZF *bgzf_open(const char *fn, const char *mode) {
    if (!mode || mode[0] != 'w') return nullptr;
    FILE *f = fopen(fn, "wb");
    if (!f) return nullptr;
    BGZF *b = new shim_BGZF();
    b->f = f;
    return b;
}

int bgzf_close(BGZF *fp) {
    if (!fp) return -1;
    if (!fp->is_reader_dummy) fp->close();
    delete fp;
    return 0;
}

int bgzf_mt(BGZF *, int, int) { return 0; }  // single-threaded shim

htsFile *hts_open(const char *fn, const char *mode) {
    (void)mode;
    FILE *probe = fopen(fn, "rb");
    if (!probe) return nullptr;
    uint8_t magic[4] = {0, 0, 0, 0};
    size_t got = fread(magic, 1, 4, probe);
    fclose(probe);
    htsFile *fp = (htsFile *)calloc(1, sizeof(htsFile));
    fp->mode = 'r';
    fp->is_cram = (got == 4 && memcmp(magic, "CRAM", 4) == 0);
    fp->is_bgzf = (got >= 2 && magic[0] == 0x1f && magic[1] == 0x8b);
    if (fp->is_bgzf) {
        ShimReader *rd = new ShimReader();
        if (!inflate_bgzf_file(fn, rd->plain, rd->blocks)) {
            delete rd;
            free(fp);
            return nullptr;
        }
        fp->priv = rd;
        BGZF *dummy = new shim_BGZF();
        dummy->is_reader_dummy = true;
        fp->fp.bgzf = dummy;
    }
    return fp;
}

int hts_close(htsFile *fp) {
    if (!fp) return -1;
    if (fp->priv) delete (ShimReader *)fp->priv;
    if (fp->fp.bgzf) bgzf_close(fp->fp.bgzf);
    free(fp);
    return 0;
}

// =================================================================== header

bam_hdr_t *sam_hdr_read(samFile *fp) {
    if (!fp || !fp->priv) return nullptr;
    ShimReader *rd = (ShimReader *)fp->priv;
    const std::vector<uint8_t> &P = rd->plain;
    if (P.size() < 12 || memcmp(P.data(), "BAM\x01", 4) != 0) return nullptr;
    bam_hdr_t *h = (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
    uint32_t l_text;
    memcpy(&l_text, &P[4], 4);
    h->l_text = l_text;
    h->text = (char *)malloc(l_text + 1);
    memcpy(h->text, &P[8], l_text);
    h->text[l_text] = 0;
    size_t p = 8 + l_text;
    int32_t n_ref;
    memcpy(&n_ref, &P[p], 4);
    p += 4;
    h->n_targets = n_ref;
    h->target_name = (char **)calloc(n_ref, sizeof(char *));
    h->target_len = (uint32_t *)calloc(n_ref, sizeof(uint32_t));
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t ln;
        memcpy(&ln, &P[p], 4);
        p += 4;
        h->target_name[i] = (char *)malloc(ln);
        memcpy(h->target_name[i], &P[p], ln);
        p += ln;
        memcpy(&h->target_len[i], &P[p], 4);
        p += 4;
    }
    rd->data_start = p;
    rd->header_parsed = 1;
    return h;
}

void sam_hdr_destroy(bam_hdr_t *h) {
    if (!h) return;
    for (int32_t i = 0; i < h->n_targets; i++) free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h->text);
    free(h);
}

int bam_hdr_write(BGZF *fp, const bam_hdr_t *h) {
    if (!fp || !h) return -1;
    fp->write("BAM\x01", 4);
    uint32_t l_text = h->l_text;
    fp->write(&l_text, 4);
    fp->write(h->text, l_text);
    int32_t n = h->n_targets;
    fp->write(&n, 4);
    for (int32_t i = 0; i < n; i++) {
        int32_t ln = (int32_t)strlen(h->target_name[i]) + 1;
        fp->write(&ln, 4);
        fp->write(h->target_name[i], ln);
        fp->write(&h->target_len[i], 4);
    }
    return 0;
}

// ================================================================== records

bam1_t *bam_init1(void) { return (bam1_t *)calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b) {
    if (!b) return;
    free(b->data);
    free(b);
}

// parse the raw in-memory record at plain offset p into b; returns the
// offset after the record, or 0 on end/underrun
static size_t parse_record(const std::vector<uint8_t> &P, size_t p,
                           bam1_t *b) {
    if (p + 4 > P.size()) return 0;
    uint32_t block_size;
    memcpy(&block_size, &P[p], 4);
    if (block_size < 32 || p + 4 + block_size > P.size()) return 0;
    const uint8_t *r = &P[p + 4];
    int32_t refID, pos, l_seq, next_refID, next_pos, tlen;
    memcpy(&refID, r, 4);
    memcpy(&pos, r + 4, 4);
    uint8_t l_read_name = r[8];
    uint8_t mapq = r[9];
    uint16_t bin, n_cigar, flag;
    memcpy(&bin, r + 10, 2);
    memcpy(&n_cigar, r + 12, 2);
    memcpy(&flag, r + 14, 2);
    memcpy(&l_seq, r + 16, 4);
    memcpy(&next_refID, r + 20, 4);
    memcpy(&next_pos, r + 24, 4);
    memcpy(&tlen, r + 28, 4);
    b->core.tid = refID;
    b->core.pos = pos;
    b->core.bin = bin;
    b->core.qual = mapq;
    b->core.l_extranul = 0;
    b->core.flag = flag;
    b->core.l_qname = l_read_name;
    b->core.n_cigar = n_cigar;
    b->core.l_qseq = l_seq;
    b->core.mtid = next_refID;
    b->core.mpos = next_pos;
    b->core.isize = tlen;
    int l_data = (int)block_size - 32;
    if (l_data > b->m_data) {
        b->data = (uint8_t *)realloc(b->data, l_data);
        b->m_data = l_data;
    }
    memcpy(b->data, r + 32, l_data);
    b->l_data = l_data;
    return p + 4 + block_size;
}

static int64_t raw_endpos(const bam1_t *b) {
    if ((b->core.flag & 4) || b->core.n_cigar == 0) return b->core.pos + 1;
    const uint32_t *cig = bam_get_cigar(b);
    int64_t adv = 0;
    for (uint32_t i = 0; i < b->core.n_cigar; i++) {
        uint32_t op = cig[i] & 0xF;
        if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            adv += cig[i] >> 4;
    }
    return adv > 0 ? b->core.pos + adv : b->core.pos + 1;
}

int64_t bam_endpos(const bam1_t *b) { return raw_endpos(b); }

int64_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar) {
    int64_t l = 0;
    for (int i = 0; i < n_cigar; i++) {
        uint32_t op = cigar[i] & 0xF;
        if (op == 0 || op == 1 || op == 4 || op == 7 || op == 8)
            l += cigar[i] >> 4;
    }
    return l;
}

int bam_write1(BGZF *fp, const bam1_t *b) {
    if (!fp) return -1;
    uint32_t block_size = 32 + (uint32_t)b->l_data;
    fp->write(&block_size, 4);
    int32_t v;
    v = b->core.tid;
    fp->write(&v, 4);
    v = (int32_t)b->core.pos;
    fp->write(&v, 4);
    uint8_t b8 = (uint8_t)b->core.l_qname;
    fp->write(&b8, 1);
    b8 = b->core.qual;
    fp->write(&b8, 1);
    uint16_t v16 = b->core.bin;
    fp->write(&v16, 2);
    v16 = (uint16_t)b->core.n_cigar;
    fp->write(&v16, 2);
    v16 = b->core.flag;
    fp->write(&v16, 2);
    v = b->core.l_qseq;
    fp->write(&v, 4);
    v = b->core.mtid;
    fp->write(&v, 4);
    v = (int32_t)b->core.mpos;
    fp->write(&v, 4);
    v = (int32_t)b->core.isize;
    fp->write(&v, 4);
    fp->write(b->data, b->l_data);
    return (int)(block_size + 4);
}

// ====================================================================== aux

static int aux_value_len(const uint8_t *s) {
    switch (*s) {
        case 'A': case 'c': case 'C': return 1;
        case 's': case 'S': return 2;
        case 'i': case 'I': case 'f': return 4;
        case 'd': return 8;
        case 'Z': case 'H': {
            int n = 0;
            while (s[1 + n]) n++;
            return n + 1;
        }
        case 'B': {
            uint8_t sub = s[1];
            uint32_t cnt;
            memcpy(&cnt, s + 2, 4);
            int esz = (sub == 'c' || sub == 'C') ? 1
                      : (sub == 's' || sub == 'S') ? 2
                      : 4;
            return 5 + (int)cnt * esz;
        }
    }
    return 0;
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    uint8_t *s = bam_get_aux((bam1_t *)b);
    uint8_t *end = b->data + b->l_data;
    while (s + 3 <= end) {
        if (s[0] == (uint8_t)tag[0] && s[1] == (uint8_t)tag[1]) return s + 2;
        int vl = aux_value_len(s + 2);
        if (vl <= 0) return nullptr;
        s += 3 + vl;
    }
    return nullptr;
}

int64_t bam_aux2i(const uint8_t *s) {
    switch (*s) {
        case 'c': return *(int8_t *)(s + 1);
        case 'C': return *(uint8_t *)(s + 1);
        case 's': { int16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'S': { uint16_t v; memcpy(&v, s + 1, 2); return v; }
        case 'i': { int32_t v; memcpy(&v, s + 1, 4); return v; }
        case 'I': { uint32_t v; memcpy(&v, s + 1, 4); return v; }
    }
    return 0;
}

double bam_aux2f(const uint8_t *s) {
    if (*s == 'f') { float v; memcpy(&v, s + 1, 4); return v; }
    if (*s == 'd') { double v; memcpy(&v, s + 1, 8); return v; }
    return (double)bam_aux2i(s);
}

char *bam_aux2Z(const uint8_t *s) {
    if (*s == 'Z' || *s == 'H') return (char *)(s + 1);
    return nullptr;
}

int bam_aux_update_int(bam1_t *b, const char tag[2], int64_t val) {
    // mirror pomfret_tpu BamRecord.set_int_tag: remove existing, append the
    // smallest unsigned/signed type
    uint8_t *s = bam_aux_get(b, tag);
    if (s) {
        uint8_t *entry = s - 2;
        int vl = aux_value_len(s);
        int total = 2 + 1 + (vl - 1);  // tag + type + value (vl includes type? no)
        total = (int)((s + 1 + (aux_value_len(s) - 1)) - entry);
        // aux_value_len(s) counts value bytes only for fixed types; recompute:
        int value_bytes = 0;
        switch (*s) {
            case 'A': case 'c': case 'C': value_bytes = 1; break;
            case 's': case 'S': value_bytes = 2; break;
            case 'i': case 'I': case 'f': value_bytes = 4; break;
            case 'd': value_bytes = 8; break;
            default: {
                value_bytes = aux_value_len(s);
                break;
            }
        }
        total = 3 + value_bytes;
        memmove(entry, entry + total,
                (b->data + b->l_data) - (entry + total));
        b->l_data -= total;
    }
    uint8_t enc[11];
    int n = 0;
    enc[n++] = tag[0];
    enc[n++] = tag[1];
    if (val >= 0 && val <= 0xFF) {
        enc[n++] = 'C';
        enc[n++] = (uint8_t)val;
    } else if (val >= -128 && val < 0) {
        enc[n++] = 'c';
        int8_t v = (int8_t)val;
        memcpy(enc + n, &v, 1);
        n += 1;
    } else if (val >= 0 && val <= 0xFFFF) {
        enc[n++] = 'S';
        uint16_t v = (uint16_t)val;
        memcpy(enc + n, &v, 2);
        n += 2;
    } else if (val >= -32768 && val < 0) {
        enc[n++] = 's';
        int16_t v = (int16_t)val;
        memcpy(enc + n, &v, 2);
        n += 2;
    } else if (val >= 0) {
        enc[n++] = 'I';
        uint32_t v = (uint32_t)val;
        memcpy(enc + n, &v, 4);
        n += 4;
    } else {
        enc[n++] = 'i';
        int32_t v = (int32_t)val;
        memcpy(enc + n, &v, 4);
        n += 4;
    }
    if (b->l_data + n > b->m_data) {
        b->m_data = b->l_data + n + 32;
        b->data = (uint8_t *)realloc(b->data, b->m_data);
    }
    memcpy(b->data + b->l_data, enc, n);
    b->l_data += n;
    return 0;
}

// ============================================================ index + iter

struct shim_hts_idx_t {
    // per-ref: bin -> chunks (vbeg, vend); linear index of 16kb windows
    std::vector<std::map<uint32_t, std::vector<std::pair<uint64_t, uint64_t>>>> bins;
    std::vector<std::vector<uint64_t>> lin;
};

hts_idx_t *sam_index_load(samFile *fp, const char *fn) {
    (void)fp;
    std::string path = std::string(fn) + ".bai";
    FILE *f = fopen(path.c_str(), "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)sz);
    if (fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
        fclose(f);
        return nullptr;
    }
    fclose(f);
    if (sz < 8 || memcmp(buf.data(), "BAI\x01", 4) != 0) return nullptr;
    shim_hts_idx_t *idx = new shim_hts_idx_t();
    size_t p = 4;
    int32_t n_ref;
    memcpy(&n_ref, &buf[p], 4);
    p += 4;
    idx->bins.resize(n_ref);
    idx->lin.resize(n_ref);
    for (int32_t r = 0; r < n_ref; r++) {
        int32_t n_bin;
        memcpy(&n_bin, &buf[p], 4);
        p += 4;
        for (int32_t bi = 0; bi < n_bin; bi++) {
            uint32_t bin;
            int32_t n_chunk;
            memcpy(&bin, &buf[p], 4);
            memcpy(&n_chunk, &buf[p + 4], 4);
            p += 8;
            for (int32_t c = 0; c < n_chunk; c++) {
                uint64_t cb, ce;
                memcpy(&cb, &buf[p], 8);
                memcpy(&ce, &buf[p + 8], 8);
                p += 16;
                if (bin != 37450)  // metadata pseudo-bin
                    idx->bins[r][bin].push_back({cb, ce});
            }
        }
        int32_t n_intv;
        memcpy(&n_intv, &buf[p], 4);
        p += 4;
        idx->lin[r].resize(n_intv);
        for (int32_t w = 0; w < n_intv; w++) {
            memcpy(&idx->lin[r][w], &buf[p], 8);
            p += 8;
        }
    }
    return idx;
}

void hts_idx_destroy(hts_idx_t *idx) { delete idx; }

struct shim_hts_itr_t {
    bool whole = false;
    int tid = -1;
    int64_t beg = 0, end = 0;
    int64_t cur = -1;  // plain offset; -1 = empty iterator
};

hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *hdr,
                          const char *region) {
    shim_hts_itr_t *it = new shim_hts_itr_t();
    if (region && strcmp(region, ".") == 0) {
        it->whole = true;
        it->cur = 0;  // resolved on first next() from the reader's data_start
        return it;
    }
    // parse name[:beg[-end]] with 1-based inclusive coordinates (what
    // sprintf "%s:%d-%d" at blockjoin.c:1053 produces; beg may be 0)
    const char *colon = strrchr(region, ':');
    std::string name = colon ? std::string(region, colon - region)
                             : std::string(region);
    int64_t beg1 = 0, end1 = INT64_MAX;
    if (colon) {
        const char *dash = strchr(colon + 1, '-');
        beg1 = atoll(colon + 1);
        if (dash) end1 = atoll(dash + 1);
    }
    int tid = -1;
    for (int32_t i = 0; i < hdr->n_targets; i++)
        if (name == hdr->target_name[i]) { tid = i; break; }
    if (tid < 0 || !idx) return it;  // empty iterator
    it->tid = tid;
    it->beg = beg1 > 0 ? beg1 - 1 : 0;
    it->end = end1;
    // start offset: linear-index window of beg, else the ref's min chunk
    const shim_hts_idx_t *ix = idx;
    uint64_t voff = UINT64_MAX;
    if (tid < (int)ix->lin.size()) {
        size_t w = (size_t)(it->beg >> 14);
        const std::vector<uint64_t> &lin = ix->lin[tid];
        for (size_t k = w; k < lin.size(); k++)
            if (lin[k]) { voff = lin[k]; break; }
        if (voff == UINT64_MAX) {
            for (auto &kv : ix->bins[tid])
                for (auto &c : kv.second) voff = std::min(voff, c.first);
        }
    }
    if (voff != UINT64_MAX) it->cur = -2 - (int64_t)0, it->cur = (int64_t)voff, it->whole = false, it->cur = (int64_t)voff | INT64_MIN;  // mark as voffset
    return it;
}

void hts_itr_destroy(hts_itr_t *itr) { delete itr; }

int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b) {
    if (!fp || !fp->priv || !itr) return -1;
    ShimReader *rd = (ShimReader *)fp->priv;
    if (!rd->header_parsed) {
        bam_hdr_t *h = sam_hdr_read(fp);  // callers read the header first,
        if (h) sam_hdr_destroy(h);        // but be safe
    }
    if (itr->whole && itr->cur == 0) itr->cur = (int64_t)rd->data_start;
    if (itr->cur < 0) {
        if (itr->cur == -1) return -1;  // empty iterator
        // voffset marker: resolve via the block table
        uint64_t voff = (uint64_t)(itr->cur & ~INT64_MIN);
        int64_t poff = voffset_to_plain(rd->blocks, voff);
        if (poff < 0) { itr->cur = -1; return -1; }
        itr->cur = poff;
    }
    while (true) {
        size_t nxt = parse_record(rd->plain, (size_t)itr->cur, b);
        if (nxt == 0) { itr->cur = -1; return -1; }
        itr->cur = (int64_t)nxt;
        if (itr->whole) return 0;
        if (b->core.tid != itr->tid || b->core.pos >= itr->end) {
            itr->cur = -1;
            return -1;
        }
        if (raw_endpos(b) > itr->beg) return 0;
    }
}

// reg2bin (UCSC binning, SAM spec)
static int reg2bin(int64_t beg, int64_t end) {
    end--;
    if (beg >> 14 == end >> 14) return (int)(((1 << 15) - 1) / 7 + (beg >> 14));
    if (beg >> 17 == end >> 17) return (int)(((1 << 12) - 1) / 7 + (beg >> 17));
    if (beg >> 20 == end >> 20) return (int)(((1 << 9) - 1) / 7 + (beg >> 20));
    if (beg >> 23 == end >> 23) return (int)(((1 << 6) - 1) / 7 + (beg >> 23));
    if (beg >> 26 == end >> 26) return (int)(((1 << 3) - 1) / 7 + (beg >> 26));
    return 0;
}

int sam_index_build3(const char *fn, const char *fnidx, int min_shift,
                     int nthreads) {
    (void)min_shift;
    (void)nthreads;
    std::vector<uint8_t> plain;
    std::vector<BlockEntry> blocks;
    if (!inflate_bgzf_file(fn, plain, blocks)) return -1;
    if (plain.size() < 12 || memcmp(plain.data(), "BAM\x01", 4) != 0)
        return -1;
    uint32_t l_text;
    memcpy(&l_text, &plain[4], 4);
    size_t p = 8 + l_text;
    int32_t n_ref;
    memcpy(&n_ref, &plain[p], 4);
    p += 4;
    for (int32_t i = 0; i < n_ref; i++) {
        int32_t ln;
        memcpy(&ln, &plain[p], 4);
        p += 4 + ln + 4;
    }
    // port of io/bam_writer.build_bai_from_meta
    std::vector<std::map<uint32_t, std::vector<std::pair<uint64_t, uint64_t>>>>
        per_bins(n_ref);
    std::vector<std::map<uint32_t, uint64_t>> per_intv(n_ref);
    std::vector<uint64_t> n_mapped(n_ref, 0), n_unmapped(n_ref, 0);
    std::vector<std::pair<uint64_t, uint64_t>> vspan(
        n_ref, {UINT64_MAX, 0});
    uint64_t n_no_coor = 0;
    bam1_t *b = bam_init1();
    while (true) {
        size_t rec_start = p;
        size_t nxt = parse_record(plain, p, b);
        if (nxt == 0) break;
        uint64_t vbeg = plain_to_voffset(blocks, rec_start);
        uint64_t vend = plain_to_voffset(blocks, nxt);
        p = nxt;
        int tid = b->core.tid;
        if (tid < 0) {
            n_no_coor++;
            continue;
        }
        bool unm = (b->core.flag & 4) != 0;
        if (unm) n_unmapped[tid]++; else n_mapped[tid]++;
        int64_t pos = b->core.pos;
        int64_t epos = raw_endpos(b);
        if (epos < pos + 1) epos = pos + 1;
        uint32_t bin = (uint32_t)reg2bin(pos, epos);
        auto &chunks = per_bins[tid][bin];
        if (!chunks.empty() && chunks.back().second == vbeg)
            chunks.back().second = vend;
        else
            chunks.push_back({vbeg, vend});
        for (int64_t w = pos >> 14; w <= ((epos - 1) >> 14); w++) {
            auto itp = per_intv[tid].find((uint32_t)w);
            if (itp == per_intv[tid].end() || vbeg < itp->second)
                per_intv[tid][(uint32_t)w] = vbeg;
        }
        if (vbeg < vspan[tid].first) vspan[tid].first = vbeg;
        if (vend > vspan[tid].second) vspan[tid].second = vend;
    }
    bam_destroy1(b);

    FILE *f = fopen(fnidx && fnidx[0] ? fnidx
                                      : (std::string(fn) + ".bai").c_str(),
                    "wb");
    if (!f) return -1;
    fwrite("BAI\x01", 1, 4, f);
    fwrite(&n_ref, 4, 1, f);
    for (int32_t r = 0; r < n_ref; r++) {
        int32_t n_bin = (int32_t)per_bins[r].size() +
                        ((n_mapped[r] + n_unmapped[r]) > 0 ? 1 : 0);
        fwrite(&n_bin, 4, 1, f);
        for (auto &kv : per_bins[r]) {
            uint32_t bin = kv.first;
            int32_t n_chunk = (int32_t)kv.second.size();
            fwrite(&bin, 4, 1, f);
            fwrite(&n_chunk, 4, 1, f);
            for (auto &c : kv.second) {
                fwrite(&c.first, 8, 1, f);
                fwrite(&c.second, 8, 1, f);
            }
        }
        if (n_mapped[r] + n_unmapped[r] > 0) {
            uint32_t meta_bin = 37450;
            int32_t two = 2;
            fwrite(&meta_bin, 4, 1, f);
            fwrite(&two, 4, 1, f);
            uint64_t v0 = vspan[r].first == UINT64_MAX ? 0 : vspan[r].first;
            fwrite(&v0, 8, 1, f);
            fwrite(&vspan[r].second, 8, 1, f);
            fwrite(&n_mapped[r], 8, 1, f);
            fwrite(&n_unmapped[r], 8, 1, f);
        }
        int32_t n_intv =
            per_intv[r].empty() ? 0 : (int32_t)(per_intv[r].rbegin()->first + 1);
        fwrite(&n_intv, 4, 1, f);
        uint64_t prev = 0;
        for (int32_t w = 0; w < n_intv; w++) {
            auto itp = per_intv[r].find((uint32_t)w);
            if (itp != per_intv[r].end()) prev = itp->second;
            fwrite(&prev, 8, 1, f);
        }
    }
    fwrite(&n_no_coor, 8, 1, f);
    fclose(f);
    return 0;
}

// ================================================================ base mods

struct shim_hts_base_mod_state {
    // mods per STORED position, built at bam_parse_basemod time
    // (port of io/basemod.py mods_per_stored_position)
    std::map<int, std::vector<hts_base_mod>> at;
    int next_pos = 0;
    int l_qseq = 0;
};

hts_base_mod_state *hts_base_mod_state_alloc(void) {
    return new shim_hts_base_mod_state();
}

void hts_base_mod_state_free(hts_base_mod_state *state) { delete state; }

static char compl_base(char c) {
    switch (c) {
        case 'A': return 'T';
        case 'C': return 'G';
        case 'G': return 'C';
        case 'T': return 'A';
        case 'U': return 'A';
    }
    return 'N';
}

int bam_parse_basemod(const bam1_t *b, hts_base_mod_state *state) {
    state->at.clear();
    state->next_pos = 0;
    state->l_qseq = b->core.l_qseq;
    const uint8_t *mm = bam_aux_get(b, "MM");
    if (!mm) mm = bam_aux_get(b, "Mm");
    if (!mm || *mm != 'Z') return 0;
    const char *mm_s = (const char *)(mm + 1);
    const uint8_t *ml = bam_aux_get(b, "ML");
    if (!ml) ml = bam_aux_get(b, "Ml");
    const uint8_t *ml_vals = nullptr;
    uint32_t ml_n = 0;
    if (ml && *ml == 'B' && ml[1] == 'C') {
        memcpy(&ml_n, ml + 2, 4);
        ml_vals = ml + 6;
    }

    int L = b->core.l_qseq;
    const uint8_t *seqi = bam_get_seq((bam1_t *)b);
    bool rev = (b->core.flag & 16) != 0;
    std::string original(L, 'N');
    for (int i = 0; i < L; i++) {
        char c = seq_nt16_str[bam_seqi(seqi, i)];
        if (rev) original[L - 1 - i] = compl_base(c);
        else original[i] = c;
    }

    size_t ml_i = 0;
    const char *s = mm_s;
    while (*s) {
        // one MM item: base strand codes [.?] , deltas ;
        char base = *s++;
        if (!base || !*s) break;
        char strand = *s++;
        std::vector<int> codes;  // char code or -chebi
        bool chebi = (*s >= '0' && *s <= '9');
        if (chebi) {
            long id = 0;
            while (*s >= '0' && *s <= '9') id = id * 10 + (*s++ - '0');
            codes.push_back(-(int)id);
        } else {
            while (*s && *s != ',' && *s != ';' && *s != '.' && *s != '?')
                codes.push_back((int)(unsigned char)*s++);
        }
        if (*s == '.' || *s == '?') s++;  // implicit flag — not reported here
        std::vector<long> deltas;
        while (*s == ',') {
            s++;
            long d = 0;
            while (*s >= '0' && *s <= '9') d = d * 10 + (*s++ - '0');
            deltas.push_back(d);
        }
        if (*s == ';') s++;

        int ncodes = codes.empty() ? 1 : (int)codes.size();
        // occurrences of `base` in the original orientation
        std::vector<int> occ;
        occ.reserve(L / 4 + 1);
        for (int i = 0; i < L; i++)
            if (base == 'N' || original[i] == base) occ.push_back(i);
        long cum = 0;
        for (size_t k = 0; k < deltas.size(); k++) {
            cum += deltas[k] + 1;
            long idx = cum - 1;
            size_t ml_base = ml_i + k * ncodes;
            if (idx < (long)occ.size()) {
                int orig_pos = occ[idx];
                int stored = rev ? (L - 1 - orig_pos) : orig_pos;
                auto &lst = state->at[stored];
                for (int ci = 0; ci < ncodes; ci++) {
                    hts_base_mod m;
                    m.modified_base = codes.empty() ? '?' : codes[ci];
                    m.canonical_base = base;
                    m.strand = (strand == '-') ? 1 : 0;
                    m.qual = (ml_vals && ml_base + ci < ml_n)
                                 ? ml_vals[ml_base + ci]
                                 : 255;
                    lst.push_back(m);
                }
            }
        }
        ml_i += deltas.size() * ncodes;
    }
    return 0;
}

int bam_mods_at_next_pos(const bam1_t *b, hts_base_mod_state *state,
                         hts_base_mod *mods, int n_mods) {
    (void)b;
    if (state->next_pos >= state->l_qseq) return -1;
    int pos = state->next_pos++;
    auto it = state->at.find(pos);
    if (it == state->at.end()) return 0;
    int n = (int)it->second.size();
    for (int i = 0; i < n && i < n_mods; i++) mods[i] = it->second[i];
    return n;
}

int bam_next_basemod(const bam1_t *b, hts_base_mod_state *state,
                     hts_base_mod *mods, int n_mods, int *pos) {
    // iterate to the next position that HAS mods (htslib semantics)
    while (state->next_pos < state->l_qseq) {
        int p = state->next_pos;
        int n = bam_mods_at_next_pos(b, state, mods, n_mods);
        if (n > 0) {
            *pos = p;
            return n;
        }
    }
    return 0;
}

// ============================================================ fisher exact
// port of pomfret_tpu/core/fisher.py (htslib kfunc tail-walk semantics)

static double lbinom(long n, long k) {
    if (k == 0 || n == k) return 0.0;
    return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1);
}

static double hypergeo(long n11, long n1_, long n_1, long n) {
    return exp(lbinom(n1_, n11) + lbinom(n - n1_, n_1 - n11) -
               lbinom(n, n_1));
}

double kt_fisher_exact(int n11i, int n12i, int n21i, int n22i,
                       double *_left, double *_right, double *two) {
    long n11 = n11i, n12 = n12i, n21 = n21i, n22 = n22i;
    long n1_ = n11 + n12, n_1 = n11 + n21;
    long n = n11 + n12 + n21 + n22;
    long mx = n_1 < n1_ ? n_1 : n1_;
    long mn = n1_ + n_1 - n;
    if (mn < 0) mn = 0;
    if (mn == mx) {
        *_left = *_right = *two = 1.0;
        return 1.0;
    }
    double q = hypergeo(n11, n1_, n_1, n);

    double p = hypergeo(mn, n1_, n_1, n);
    double left = 0.0;
    long i = mn + 1;
    while (p < 0.99999999 * q && i <= mx) {
        left += p;
        p = hypergeo(i, n1_, n_1, n);
        i++;
    }
    i--;
    if (p < 1.00000001 * q) left += p;
    else i--;

    p = hypergeo(mx, n1_, n_1, n);
    double right = 0.0;
    long j = mx - 1;
    while (p < 0.99999999 * q && j >= 0) {
        right += p;
        p = hypergeo(j, n1_, n_1, n);
        j--;
    }
    j++;
    if (p < 1.00000001 * q) right += p;
    else j++;

    double t = left + right;
    if (t > 1.0) t = 1.0;
    if (labs(i - n11) < labs(j - n11)) right = 1.0 - left + q;
    else left = 1.0 - right + q;
    *_left = left;
    *_right = right;
    *two = t;
    return t;
}

}  // extern "C"
