// Native CSV trajectory parser for the host data pipeline.
//
// The reference loads thousands of per-actor CSV files with np.loadtxt
// (utils/data.py:228), which is Python-loop bound; dataset builds dominate
// host time on small-core machines.  This parser memory-slurps each file
// and converts with a tight strtof loop (~20x faster than np.loadtxt).
//
// C ABI (consumed via ctypes from mocodad_tpu/data/native.py):
//   csv_read_alloc(path, &rows, &cols) -> malloc'd row-major float buffer
//                                          (NULL on error; cols from line 1)
//   csv_free(buf)
//
// Build: g++ -O3 -march=native -shared -fPIC trajectory_loader.cpp
//        -o libtrajloader.so

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

float* csv_read_alloc(const char* path, long* rows_out, long* cols_out) {
    *rows_out = 0;
    *cols_out = 0;
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size <= 0) { std::fclose(f); return nullptr; }

    char* buf = static_cast<char*>(std::malloc(size + 1));
    if (!buf) { std::fclose(f); return nullptr; }
    long got = static_cast<long>(std::fread(buf, 1, size, f));
    std::fclose(f);
    if (got != size) { std::free(buf); return nullptr; }
    buf[size] = '\0';

    // count columns from the first line, rows from newlines
    long cols = 1;
    long i = 0;
    while (i < size && buf[i] != '\n') {
        if (buf[i] == ',') ++cols;
        ++i;
    }
    long rows = 0;
    bool in_line = false;
    for (long j = 0; j < size; ++j) {
        if (buf[j] == '\n') { if (in_line) ++rows; in_line = false; }
        else if (buf[j] != '\r' && buf[j] != ' ' && buf[j] != '\t') {
            in_line = true;
        }
    }
    if (in_line) ++rows;  // last line without trailing newline
    if (rows == 0 || cols == 0) { std::free(buf); return nullptr; }

    float* out = static_cast<float*>(
        std::malloc(sizeof(float) * rows * cols));
    if (!out) { std::free(buf); return nullptr; }

    char* p = buf;
    char* end = buf + size;
    long n = 0;
    long total = rows * cols;
    while (p < end && n < total) {
        // skip separators / whitespace / newlines
        while (p < end && (*p == ',' || *p == '\n' || *p == '\r' ||
                           *p == ' ' || *p == '\t')) ++p;
        if (p >= end) break;
        char* next = nullptr;
        float v = std::strtof(p, &next);
        if (next == p) { ++p; continue; }  // unparsable char: skip
        out[n++] = v;
        p = next;
    }
    std::free(buf);
    if (n != total) { std::free(out); return nullptr; }
    *rows_out = rows;
    *cols_out = cols;
    return out;
}

void csv_free(float* buf) { std::free(buf); }

}  // extern "C"
