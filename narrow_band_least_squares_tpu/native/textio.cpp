// Fast TSV results codec for the continuous-monitoring workflow.
//
// The reference persists results as TSV via a per-row Python string loop
// (reference helpers.py:161-182).  At monitoring scale (weeks of segments,
// millions of (band, window) rows) that loop dominates host time, so the
// codec is native: shortest-round-trip float formatting (std::to_chars,
// same shortest-representation contract as Python's repr) and a mmap-free
// streaming parser.  Loaded via ctypes (io/textio.py) with a pure-Python
// fallback when the shared object has not been built.
//
// Row format (byte-compatible with the reference):
//   header: "Fmin \t Fmax \t Time \t Trace_vel \t Backaz \t MdCCM \n"
//   per band b, rows j < num_compute[b]:
//   str(fmin_b)\t str(fmax_b)\t str(t[b,j])\t str(vel[b,j])\t
//   str(baz[b,j])\t str(mdccm[b,j])\n

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// shortest round-trip decimal form, Python-repr style ("1.0" not "1")
void format_double(double v, std::string& out) {
    char buf[32];
    auto res = std::to_chars(buf, buf + sizeof(buf), v);
    size_t n = res.ptr - buf;
    bool has_dot = false, has_exp = false;
    for (size_t i = 0; i < n; ++i) {
        if (buf[i] == '.') has_dot = true;
        if (buf[i] == 'e' || buf[i] == 'E') has_exp = true;
    }
    if (!has_dot && !has_exp && n < sizeof(buf) - 2) {
        buf[n++] = '.';
        buf[n++] = '0';
    }
    out.append(buf, n);
}

}  // namespace

extern "C" {

// Returns 0 on success, negative errno-style code on failure.
int nbls_write_tsv(const char* path,
                   const double* freqlist,      // nbands + 1 edges
                   const double* t,             // (nbands, width) row-major
                   const double* vel,
                   const double* baz,
                   const double* mdccm,
                   const int64_t* num_compute,  // nbands
                   int64_t nbands,
                   int64_t width) {
    std::FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    std::string buf;
    buf.reserve(1 << 22);
    buf.append("Fmin \t Fmax \t Time \t Trace_vel \t Backaz \t MdCCM \n");
    for (int64_t b = 0; b < nbands; ++b) {
        const int64_t n = num_compute[b];
        for (int64_t j = 0; j < n && j < width; ++j) {
            const int64_t k = b * width + j;
            format_double(freqlist[b], buf);
            buf.push_back('\t');
            format_double(freqlist[b + 1], buf);
            buf.push_back('\t');
            format_double(t[k], buf);
            buf.push_back('\t');
            format_double(vel[k], buf);
            buf.push_back('\t');
            format_double(baz[k], buf);
            buf.push_back('\t');
            format_double(mdccm[k], buf);
            buf.push_back('\n');
            if (buf.size() > (1 << 22) - 256) {
                if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
                    std::fclose(f);
                    return -2;
                }
                buf.clear();
            }
        }
    }
    if (!buf.empty() &&
        std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        return -2;
    }
    std::fclose(f);
    return 0;
}

// Counts data rows (excluding the header).  Returns row count or negative.
int64_t nbls_count_tsv_rows(const char* path) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::vector<char> chunk(1 << 20);
    int64_t rows = 0;
    size_t got;
    while ((got = std::fread(chunk.data(), 1, chunk.size(), f)) > 0) {
        for (size_t i = 0; i < got; ++i)
            if (chunk[i] == '\n') ++rows;
    }
    std::fclose(f);
    return rows > 0 ? rows - 1 : 0;  // minus header
}

// Parses the 6 float columns into caller-allocated arrays of length nrows.
// Returns rows parsed, or negative on error.
int64_t nbls_read_tsv(const char* path,
                      double* fmin, double* fmax, double* t,
                      double* vel, double* baz, double* mdccm,
                      int64_t nrows) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::string content;
    {
        std::fseek(f, 0, SEEK_END);
        long sz = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        content.resize(sz);
        if (sz > 0 && std::fread(&content[0], 1, sz, f) != (size_t)sz) {
            std::fclose(f);
            return -2;
        }
    }
    std::fclose(f);

    const char* p = content.data();
    const char* end = p + content.size();
    // skip header line
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;

    double* cols[6] = {fmin, fmax, t, vel, baz, mdccm};
    int64_t row = 0;
    while (p < end && row < nrows) {
        for (int c = 0; c < 6; ++c) {
            while (p < end && (*p == ' ' || *p == '\t')) ++p;
            double v;
            auto res = std::from_chars(p, end, v);
            if (res.ec != std::errc()) {
                return row;  // truncated/garbled tail: return what we have
            }
            cols[c][row] = v;
            p = res.ptr;
        }
        while (p < end && *p != '\n') ++p;
        if (p < end) ++p;
        ++row;
    }
    return row;
}

}  // extern "C"
