/* htslib API shim for the differential-parity harness (VERDICT r1 item 3).
 *
 * This is NOT htslib: it is a from-scratch implementation of the ~30
 * htslib symbols /root/reference/blockjoin.c consumes (includes at
 * blockjoin.c:6-10, link list Makefile:11), backed by the same BAM/BGZF/
 * basemod/Fisher semantics pomfret_tpu implements in Python/C++. It exists
 * so the READ-ONLY reference sources can be compiled unmodified into a
 * test oracle binary and run head-to-head against pomfret_tpu on synthetic
 * datasets (tests/test_differential.py). Struct layouts are our own — the
 * reference is recompiled against this header, so only source-level
 * compatibility matters, not ABI.
 */
#ifndef POMFRET_SHIM_SAM_H
#define POMFRET_SHIM_SAM_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------------------------------------------------ files */

typedef struct shim_BGZF BGZF; /* writer handle (bgzf_open) / mt target */

typedef struct htsFile {
    int is_bgzf;  /* blockjoin.c:576, 4609 */
    int is_cram;  /* blockjoin.c:4609 */
    union {
        BGZF *bgzf;
        void *voidp;
    } fp;         /* blockjoin.c:577 passes fp.bgzf to bgzf_mt */
    /* internal */
    char mode;    /* 'r' or 'w' */
    void *priv;   /* ShimReader* */
} htsFile;
typedef htsFile samFile;

htsFile *hts_open(const char *fn, const char *mode);
int hts_close(htsFile *fp);
#define sam_close(fp) hts_close(fp)

BGZF *bgzf_open(const char *fn, const char *mode);
int bgzf_close(BGZF *fp);
int bgzf_mt(BGZF *fp, int n_threads, int n_sub_blks);

/* ----------------------------------------------------------------- header */

typedef struct sam_hdr_t {
    int32_t n_targets;
    uint32_t *target_len;
    char **target_name;
    /* internal */
    char *text;
    uint32_t l_text;
} sam_hdr_t;
typedef sam_hdr_t bam_hdr_t;

bam_hdr_t *sam_hdr_read(samFile *fp);
void sam_hdr_destroy(bam_hdr_t *h);
#define bam_hdr_destroy(h) sam_hdr_destroy(h)
int bam_hdr_write(BGZF *fp, const bam_hdr_t *h);

/* ---------------------------------------------------------------- records */

typedef struct bam1_core_t {
    int64_t pos;
    int32_t tid;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul; /* always 0 in this shim */
    uint16_t flag;
    uint16_t l_qname;   /* includes the trailing NUL */
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int64_t mpos;
    int64_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    uint8_t *data;  /* qname NUL | cigar | seq(4bit) | qual | aux */
    int l_data;
    int m_data;
} bam1_t;

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);

#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) ((uint32_t *)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + (b)->core.l_qname + ((b)->core.n_cigar << 2))
#define bam_get_qual(b)  (bam_get_seq(b) + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b)   (bam_get_qual(b) + (b)->core.l_qseq)
#define bam_get_l_aux(b) ((b)->l_data - ((b)->core.l_qname + ((b)->core.n_cigar << 2) + (((b)->core.l_qseq + 1) >> 1) + (b)->core.l_qseq))
#define bam_seqi(s, i)   ((s)[(i) >> 1] >> (((~(i)) & 1) << 2) & 0xf)
#define bam_is_rev(b)    (((b)->core.flag & 16) != 0)

#define bam_cigar_op(c)    ((c) & 0xf)
#define bam_cigar_oplen(c) ((c) >> 4)
#define BAM_CIGAR_STR "MIDNSHP=XB"

#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9

#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

extern const char seq_nt16_str[];

int64_t bam_endpos(const bam1_t *b);
int64_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar);
int bam_write1(BGZF *fp, const bam1_t *b);

/* -------------------------------------------------------------------- aux */

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);
int64_t bam_aux2i(const uint8_t *s);
double bam_aux2f(const uint8_t *s);
char *bam_aux2Z(const uint8_t *s);
int bam_aux_update_int(bam1_t *b, const char tag[2], int64_t val);

/* ----------------------------------------------------------- index + itr */

typedef struct shim_hts_idx_t hts_idx_t;
typedef struct shim_hts_itr_t hts_itr_t;

hts_idx_t *sam_index_load(samFile *fp, const char *fn);
void hts_idx_destroy(hts_idx_t *idx);
hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *hdr,
                          const char *region);
int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b);
void hts_itr_destroy(hts_itr_t *itr);
int sam_index_build3(const char *fn, const char *fnidx, int min_shift,
                     int nthreads);

/* ------------------------------------------------------------- base mods */

typedef struct hts_base_mod {
    int modified_base;  /* char code, or -ChEBI id */
    int canonical_base; /* base as recorded in the MM item */
    int strand;
    int qual;           /* ML value, -1 if absent */
} hts_base_mod;

typedef struct shim_hts_base_mod_state hts_base_mod_state;

hts_base_mod_state *hts_base_mod_state_alloc(void);
void hts_base_mod_state_free(hts_base_mod_state *state);
int bam_parse_basemod(const bam1_t *b, hts_base_mod_state *state);
int bam_mods_at_next_pos(const bam1_t *b, hts_base_mod_state *state,
                         hts_base_mod *mods, int n_mods);
int bam_next_basemod(const bam1_t *b, hts_base_mod_state *state,
                     hts_base_mod *mods, int n_mods, int *pos);

#ifdef __cplusplus
}
#endif

#endif /* POMFRET_SHIM_SAM_H */
