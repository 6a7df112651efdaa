// Golden-vector harness: drives the UPSTREAM reference codec (compiled from
// /root/reference, never copied into this repo) with zero-initialized
// buffers so its output is a pure function of the input bytes. Used only by
// the test suite to cross-check our from-scratch implementations.
//
// Usage:
//   harness eb <0|1 ext> <in> <out>   encode one block payload
//   harness db <0|1 ext> <in> <out>   decode one block payload
//   harness c  <0|1 ext> <in> <out>   whole-file container compress
//   harness d  <in> <out>             whole-file container decompress
//   harness bc <0|1 ext> <in>         MT memory-mode compress bench:
//                                     best-of-four warm passes, prints secs
//   harness bd <in>                   MT memory-mode decompress bench, same
// The b* modes exist for fair same-box baselines: the bench host has slow,
// erratic first-touch page faults, so single-shot process timings measure
// the memory subsystem, not the codec. Warm best-of-four matches how our
// own numbers are taken.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include "turbosqueeze.h"

extern "C" void tsqEncode(struct TSQCompressionContext*, uint8_t*, uint8_t*,
                          uint32_t*, uint32_t, uint32_t);
extern "C" void tsqDecode(uint8_t*, uint8_t*, uint32_t*, uint32_t, uint32_t);
extern "C" void tsqCompress(FILE*, FILE*, bool, uint32_t);
extern "C" void tsqDecompress(FILE*, FILE*);

static std::vector<uint8_t> read_all(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> v(n);
    if (n && fread(v.data(), 1, n, f) != (size_t)n) { perror("fread"); exit(2); }
    fclose(f);
    return v;
}

static void write_all(const char* path, const uint8_t* p, size_t n) {
    FILE* f = fopen(path, "wb");
    if (!f) { perror(path); exit(2); }
    if (n && fwrite(p, 1, n, f) != n) { perror("fwrite"); exit(2); }
    fclose(f);
}

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "bad args\n"); return 1; }
    const char* mode = argv[1];

    if (!strcmp(mode, "eb") || !strcmp(mode, "db")) {
        if (argc != 5) return 1;
        int ext = atoi(argv[2]);
        std::vector<uint8_t> in = read_all(argv[3]);
        if (!strcmp(mode, "eb")) {
            // zero-padded input block (overread determinism) + zeroed output
            std::vector<uint8_t> inbuf(in.size() + 128, 0);
            memcpy(inbuf.data(), in.data(), in.size());
            std::vector<uint8_t> outbuf(TSQ_OUTPUT_SZ + 64, 0);
            TSQCompressionContext ctx;
            std::vector<uint16_t> hash((1u << 17), 0);
            ctx.refhash = hash.data();
            uint32_t outsz = 0;
            tsqEncode(&ctx, inbuf.data(), outbuf.data(), &outsz,
                      (uint32_t)in.size(), ext);
            write_all(argv[4], outbuf.data(), outsz);
        } else {
            std::vector<uint8_t> inbuf(in.size() + 64, 0);
            memcpy(inbuf.data(), in.data(), in.size());
            std::vector<uint8_t> outbuf(TSQ_BLOCK_SZ + 128, 0);
            uint32_t outsz = 0;
            tsqDecode(inbuf.data(), outbuf.data(), &outsz,
                      (uint32_t)in.size(), ext);
            write_all(argv[4], outbuf.data(), outsz);
        }
        return 0;
    }

    if (!strcmp(mode, "c")) {
        if (argc != 5) return 1;
        FILE* fi = fopen(argv[3], "rb");
        FILE* fo = fopen(argv[4], "wb");
        if (!fi || !fo) return 2;
        tsqCompress(fi, fo, atoi(argv[2]) != 0, 0);
        fclose(fi); fclose(fo);
        return 0;
    }

    if (!strcmp(mode, "d")) {
        FILE* fi = fopen(argv[2], "rb");
        FILE* fo = fopen(argv[3], "wb");
        if (!fi || !fo) return 2;
        tsqDecompress(fi, fo);
        fclose(fi); fclose(fo);
        return 0;
    }

    if (!strcmp(mode, "bc")) {
        if (argc != 4) return 1;
        bool ext = atoi(argv[2]) != 0;
        std::vector<uint8_t> in = read_all(argv[3]);
        TSQCompressionContext_MT* ctx = tsqAllocateContextCompression_MT(false);
        double best = 1e30;
        size_t outsz = 0;
        for (int r = 0; r < 4; ++r) {
            uint8_t* out = nullptr;
            auto t0 = std::chrono::steady_clock::now();
            bool ok = tsqCompress_MT(ctx, in.data(), in.size(), false,
                                     &out, &outsz, false, ext, 0);
            std::chrono::duration<double> dt =
                std::chrono::steady_clock::now() - t0;
            if (!ok) { fprintf(stderr, "compress failed\n"); return 3; }
            if (dt.count() < best) best = dt.count();
            free(out);
        }
        tsqDeallocateContextCompression_MT(ctx);
        printf("%.6f %zu\n", best, outsz);
        return 0;
    }

    if (!strcmp(mode, "bd")) {
        if (argc != 3) return 1;
        std::vector<uint8_t> in = read_all(argv[2]);
        TSQDecompressionContext_MT* ctx =
            tsqAllocateContextDecompression_MT(false);
        double best = 1e30;
        size_t outsz = 0;
        for (int r = 0; r < 4; ++r) {
            uint8_t* out = nullptr;
            auto t0 = std::chrono::steady_clock::now();
            bool ok = tsqDecompress_MT(ctx, in.data(), in.size(), false,
                                       &out, &outsz, false);
            std::chrono::duration<double> dt =
                std::chrono::steady_clock::now() - t0;
            if (!ok) { fprintf(stderr, "decompress failed\n"); return 3; }
            if (dt.count() < best) best = dt.count();
            free(out);
        }
        tsqDeallocateContextDecompression_MT(ctx);
        printf("%.6f %zu\n", best, outsz);
        return 0;
    }

    fprintf(stderr, "unknown mode %s\n", mode);
    return 1;
}
