// Fast numeric-table parser for trajectory/GNSS text files.
//
// The host-side runtime equivalent of the reference's np.loadtxt usage
// (TUM trajectories, KITTI pose files, oxts GNSS rows, GPS fix files):
// memory-maps the file and parses whitespace/comma-separated floating-point
// tables in one pass with strtod, ~10-30x faster than np.loadtxt on large
// trajectory logs. '#'-prefixed comment lines are skipped (TUM convention).
//
// C ABI, consumed from Python via ctypes (gps_optimize_slam_tpu.io.native).
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {
// from_chars is locale-free and ~4x faster than strtod (GCC >= 11 supports
// the floating-point overload). Handles the scientific notation our file
// formats use; strtod remains as a compile-time fallback.
inline const char* parse_double(const char* p, const char* end, double* out,
                                bool* ok) {
#if defined(__cpp_lib_to_chars) && __cpp_lib_to_chars >= 201611L
  auto res = std::from_chars(p, end, *out);
  *ok = (res.ec == std::errc());
  return res.ptr;
#else
  char* next = nullptr;
  *out = strtod(p, &next);
  *ok = (next != p);
  (void)end;
  return next;
#endif
}
}  // namespace

extern "C" {

// Returns 0 on success. First call with values=nullptr to obtain the shape
// (n_rows, n_cols); then call again with a buffer of size n_rows*n_cols.
// n_cols is taken from the first data row; short rows are an error (-3),
// extra columns beyond n_cols are an error (-4). Comma is treated as
// whitespace (the reference's delimiter fallback, EKFGPSSLAM.py:252-253).
int fastparse_table(const char* path, double* values, int64_t* n_rows,
                    int64_t* n_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) {
    close(fd);
    *n_rows = 0;
    *n_cols = 0;
    return 0;
  }
  const char* data =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return -2;

  const char* p = data;
  const char* end = data + size;
  int64_t rows = 0;
  int64_t cols = *n_cols;  // 0 = infer from first row
  bool counting = (values == nullptr);
  // On the fill call, *n_rows is the caller's buffer capacity (set by the
  // sizing call). The file may have grown between the two calls (e.g. an
  // actively-appended log); never write past the buffer — error out instead.
  int64_t capacity = counting ? 0 : *n_rows;
  int rc = 0;

  while (p < end) {
    // Skip leading spaces/commas on the line.
    while (p < end && (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r')) ++p;
    if (p < end && *p == '\n') {
      ++p;
      continue;
    }
    if (p >= end) break;
    if (*p == '#') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    // Parse one row.
    if (!counting && rows >= capacity) {  // file grew since the sizing call
      rc = -6;
      goto done;
    }
    int64_t c = 0;
    while (p < end && *p != '\n') {
      double v;
      bool ok;
      const char* next = parse_double(p, end, &v, &ok);
      if (!ok) {  // unparsable token
        rc = -5;
        goto done;
      }
      if (!counting) {
        if (c < cols) values[rows * cols + c] = v;
        else {
          rc = -4;
          goto done;
        }
      }
      ++c;
      p = next;
      while (p < end && (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r')) ++p;
    }
    if (cols == 0) cols = c;
    if (c != cols) {
      rc = (c < cols) ? -3 : -4;
      goto done;
    }
    ++rows;
    if (p < end) ++p;  // consume newline
  }

done:
  munmap(const_cast<char*>(data), size);
  if (rc == 0) {
    *n_rows = rows;
    *n_cols = cols;
  }
  return rc;
}

// KITTI oxts directory scanner: the native data-loader for the GPSmerge
// ETL (reference GPSmerge.py:41-62 reads one numpy table per frame from
// Python — thousands of tiny files). One C call scans data_dir/%010d.txt
// for frame 0..max_frames-1, extracting per row:
//   [frame_index, lat(col0), lon(col1), alt(col2), numsats(col25),
//    velmode(col27)]
// Missing frame files are skipped (mirrors the Python loop). Rows with
// fewer than 28 columns are an error (-3). Same two-call shape protocol:
// values=nullptr sizes the output (*n_rows), second call fills a
// (*n_rows x 6) buffer, treating the sized row count as capacity (-6 if
// the directory grew in between).
int fastparse_oxts_dir(const char* data_dir, double* values, int64_t* n_rows,
                       int64_t max_frames) {
  bool counting = (values == nullptr);
  int64_t capacity = counting ? 0 : *n_rows;
  int64_t out_rows = 0;
  char path[4096];

  for (int64_t idx = 0; idx < max_frames; ++idx) {
    int len = snprintf(path, sizeof(path), "%s/%010lld.txt", data_dir,
                       static_cast<long long>(idx));
    if (len <= 0 || static_cast<size_t>(len) >= sizeof(path)) return -1;
    int fd = open(path, O_RDONLY);
    if (fd < 0) continue;  // missing frame file: skip (Python parity)
    struct stat st;
    if (fstat(fd, &st) != 0) {
      close(fd);
      return -1;
    }
    size_t size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      close(fd);
      continue;
    }
    const char* data = static_cast<const char*>(
        mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    close(fd);
    if (data == MAP_FAILED) return -2;

    const char* p = data;
    const char* end = data + size;
    int rc = 0;
    while (p < end) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r')) ++p;
      if (p < end && *p == '\n') {
        ++p;
        continue;
      }
      if (p >= end) break;
      if (*p == '#') {
        while (p < end && *p != '\n') ++p;
        continue;
      }
      double keep[28];
      int64_t c = 0;
      while (p < end && *p != '\n') {
        double v;
        bool ok;
        const char* next = parse_double(p, end, &v, &ok);
        if (!ok) {
          rc = -5;
          goto file_done;
        }
        if (c < 28) keep[c] = v;
        ++c;
        p = next;
        while (p < end && (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r')) ++p;
      }
      if (p < end) ++p;  // newline
      if (c < 28) {
        rc = -3;
        goto file_done;
      }
      if (!counting) {
        if (out_rows >= capacity) {
          rc = -6;
          goto file_done;
        }
        double* row = values + out_rows * 6;
        row[0] = static_cast<double>(idx);
        row[1] = keep[0];
        row[2] = keep[1];
        row[3] = keep[2];
        row[4] = keep[25];
        row[5] = keep[27];
      }
      ++out_rows;
    }
  file_done:
    munmap(const_cast<char*>(data), size);
    if (rc != 0) return rc;
  }
  *n_rows = out_rows;
  return 0;
}

}  // extern "C"
