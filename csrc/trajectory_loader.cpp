// Native CSV trajectory parser for the host data pipeline.
//
// The reference loads thousands of per-actor CSV files with np.loadtxt
// (utils/data.py:228), which is Python-loop bound; dataset builds dominate
// host time on small-core machines.  This parser memory-slurps each file
// and converts with a tight strtof loop (~20x faster than np.loadtxt).
//
// Strictness contract (mirrors the Python fallback in
// mocodad_tpu/data/trajectories.py): every non-blank line must hold
// exactly `cols` comma-separated float fields (cols taken from the first
// non-blank line).  Ragged rows, unparsable fields, trailing junk, or
// hex-float spellings reject the whole file (return NULL) so the caller
// falls back — a malformed file must never yield a silently corrupted
// matrix.  Parsing uses the C locale explicitly, so a host process that
// set a comma-decimal LC_NUMERIC cannot change the numbers.
//
// C ABI (consumed via ctypes from mocodad_tpu/data/native.py):
//   csv_read_alloc(path, &rows, &cols) -> malloc'd row-major float buffer
//                                          (NULL on error)
//   csv_free(buf)
//
// Build: g++ -O3 -shared -fPIC trajectory_loader.cpp -o libtrajloader.so

#include <climits>
#include <clocale>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

bool blank_line(const char* p, const char* e) {
    for (; p < e; ++p)
        if (*p != ' ' && *p != '\t' && *p != '\r') return false;
    return true;
}

// numpy's float() rejects hex-float spellings that strtof accepts
bool looks_hex(const char* p, const char* e) {
    if (p < e && (*p == '+' || *p == '-')) ++p;
    return p + 1 < e && p[0] == '0' && (p[1] == 'x' || p[1] == 'X');
}

}  // namespace

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

    // pass 1: rows = non-blank lines; cols from the first non-blank line;
    // every line's comma count must match (ragged rows reject the file)
    long rows = 0, cols = 0;
    char* end = buf + size;
    for (char* p = buf; p < end; ) {
        char* nl = static_cast<char*>(std::memchr(p, '\n', end - p));
        char* le = nl ? nl : end;
        if (!blank_line(p, le)) {
            long c = 1;
            for (char* q = p; q < le; ++q)
                if (*q == ',') ++c;
            if (cols == 0) cols = c;
            else if (c != cols) { std::free(buf); return nullptr; }
            ++rows;
        }
        p = nl ? nl + 1 : end;
    }
    if (rows == 0 || cols == 0) { std::free(buf); return nullptr; }
    // overflow guard: sizeof(float) * rows * cols must not wrap
    if (rows > static_cast<long>(LONG_MAX / sizeof(float)) / cols) {
        std::free(buf);
        return nullptr;
    }

    float* out = static_cast<float*>(
        std::malloc(sizeof(float) * rows * cols));
    if (!out) { std::free(buf); return nullptr; }

    // locale-pinned parsing (leaked once; locale_t is immutable after)
    static locale_t c_loc = newlocale(LC_ALL_MASK, "C",
                                      static_cast<locale_t>(0));

    // pass 2: strict per-line parse — exactly `cols` fields per line
    long n = 0;
    for (char* p = buf; p < end; ) {
        char* nl = static_cast<char*>(std::memchr(p, '\n', end - p));
        char* le = nl ? nl : end;
        if (!blank_line(p, le)) {
            char* q = p;
            for (long c = 0; c < cols; ++c) {
                while (q < le && (*q == ' ' || *q == '\t')) ++q;
                if (looks_hex(q, le)) { goto fail; }
                char* next = nullptr;
                float v = c_loc ? strtof_l(q, &next, c_loc)
                                : std::strtof(q, &next);
                if (next == q || next > le) { goto fail; }
                out[n++] = v;
                q = next;
                while (q < le && (*q == ' ' || *q == '\t' || *q == '\r'))
                    ++q;
                if (c + 1 < cols) {
                    if (q >= le || *q != ',') { goto fail; }
                    ++q;
                }
            }
            if (q != le) { goto fail; }  // trailing junk after last field
        }
        p = nl ? nl + 1 : end;
    }
    std::free(buf);
    *rows_out = rows;
    *cols_out = cols;
    return out;

fail:
    std::free(buf);
    std::free(out);
    return nullptr;
}

void csv_free(float* buf) { std::free(buf); }

}  // extern "C"
