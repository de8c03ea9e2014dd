// tasas.cpp — WER/CER edit-distance tool + bootstrap confidence intervals.
//
// C++ twin of the reference's ANSI-C tools (/root/reference/src/evaluation/
// tasas/tasas.c and tasasIntervalo.c): sub/ins/del dynamic-programming edit
// distance, "ref#hyp" line protocol (-f sentence separator, -s symbol
// separator; with -s " " -> WER over words, without -> CER over characters),
// and bootstrap resampling CIs (default 1000 resamples). Differences by
// design: one binary serves both roles (point estimate and --bootstrap), the
// RNG is seedable for deterministic tests (the reference uses srand(time(0)),
// tasasIntervalo.c:935-939), and the core is exported with C linkage so the
// Python framework binds it via ctypes instead of subprocess.
//
// Build: make -C native   (produces tasas, tasasIntervalo, libtasas.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Counts {
  int64_t edits = 0;  // substitutions + insertions + deletions
  int64_t ref_len = 0;
};

// Tokenize a sentence into symbol ids. With a non-empty separator the
// sentence is split on it (WER); otherwise every byte is a symbol (CER).
std::vector<int> tokenize(const std::string& s, const std::string& sep,
                          std::unordered_map<std::string, int>* dict) {
  std::vector<int> out;
  auto intern = [&](const std::string& tok) {
    auto it = dict->find(tok);
    if (it != dict->end()) return it->second;
    int id = static_cast<int>(dict->size());
    dict->emplace(tok, id);
    return id;
  };
  if (sep.empty()) {
    for (char c : s) out.push_back(intern(std::string(1, c)));
    return out;
  }
  size_t start = 0;
  while (start <= s.size()) {
    size_t pos = s.find(sep, start);
    std::string tok = s.substr(start, pos == std::string::npos ? std::string::npos
                                                               : pos - start);
    if (!tok.empty()) out.push_back(intern(tok));
    if (pos == std::string::npos) break;
    start = pos + sep.size();
  }
  return out;
}

int64_t edit_distance(const std::vector<int>& ref, const std::vector<int>& hyp) {
  const size_t n = ref.size(), m = hyp.size();
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (size_t j = 0; j <= m; ++j) prev[j] = static_cast<int64_t>(j);
  for (size_t i = 1; i <= n; ++i) {
    cur[0] = static_cast<int64_t>(i);
    for (size_t j = 1; j <= m; ++j) {
      int64_t sub = prev[j - 1] + (ref[i - 1] == hyp[j - 1] ? 0 : 1);
      cur[j] = std::min({sub, prev[j] + 1, cur[j - 1] + 1});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

struct Corpus {
  std::vector<Counts> sentences;
};

Corpus load_corpus(const char* path, const std::string& field_sep,
                   const std::string& symbol_sep) {
  Corpus corpus;
  FILE* f = std::fopen(path, "r");
  if (!f) {
    std::fprintf(stderr, "tasas: cannot open %s\n", path);
    return corpus;
  }
  std::unordered_map<std::string, int> dict;
  // unbounded line accumulation: a fixed fgets buffer would silently split
  // transcript lines longer than the buffer into two corrupt records
  auto process = [&](std::string line) {
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    size_t pos = line.find(field_sep);
    if (pos == std::string::npos) return;
    std::string ref = line.substr(0, pos);
    std::string hyp = line.substr(pos + field_sep.size());
    auto r = tokenize(ref, symbol_sep, &dict);
    auto h = tokenize(hyp, symbol_sep, &dict);
    Counts c;
    c.edits = edit_distance(r, h);
    c.ref_len = static_cast<int64_t>(r.size());
    corpus.sentences.push_back(c);
  };
  char buf[1 << 16];
  std::string acc;
  while (std::fgets(buf, sizeof(buf), f)) {
    acc += buf;
    if (!acc.empty() && acc.back() == '\n') {
      process(acc);
      acc.clear();
    }
  }
  if (!acc.empty()) process(acc);  // final line without trailing newline
  std::fclose(f);
  return corpus;
}

double rate(const std::vector<Counts>& sents) {
  int64_t edits = 0, len = 0;
  for (const auto& c : sents) {
    edits += c.edits;
    len += c.ref_len;
  }
  return len == 0 ? 0.0 : 100.0 * static_cast<double>(edits) / len;
}

void bootstrap(const std::vector<Counts>& sents, int resamples, uint64_t seed,
               double* mean_out, double* ci_out) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<size_t> pick(0, sents.empty() ? 0 : sents.size() - 1);
  std::vector<double> rates(resamples);
  std::vector<Counts> sample(sents.size());
  for (int r = 0; r < resamples; ++r) {
    for (size_t i = 0; i < sents.size(); ++i) sample[i] = sents[pick(rng)];
    rates[r] = rate(sample);
  }
  double mean = 0.0;
  for (double v : rates) mean += v;
  mean /= resamples > 0 ? resamples : 1;
  // 95% CI: half-width between the 2.5th and 97.5th percentiles
  std::sort(rates.begin(), rates.end());
  size_t lo = static_cast<size_t>(0.025 * resamples);
  size_t hi = static_cast<size_t>(0.975 * resamples);
  hi = std::min(hi, rates.empty() ? 0 : rates.size() - 1);
  double ci = rates.empty() ? 0.0 : (rates[hi] - rates[lo]) / 2.0;
  *mean_out = mean;
  *ci_out = ci;
}

}  // namespace

extern "C" {

// Point error rate (%) of a "ref<field_sep>hyp" file. symbol_sep = "" -> CER.
double tasas_error_rate(const char* path, const char* field_sep,
                        const char* symbol_sep) {
  Corpus c = load_corpus(path, field_sep, symbol_sep);
  return rate(c.sentences);
}

// Bootstrap mean ± CI. Returns 0 on success.
int tasas_bootstrap(const char* path, const char* field_sep,
                    const char* symbol_sep, int resamples, uint64_t seed,
                    double* mean_out, double* ci_out) {
  Corpus c = load_corpus(path, field_sep, symbol_sep);
  if (c.sentences.empty()) {
    *mean_out = 0.0;
    *ci_out = 0.0;
    return 1;
  }
  bootstrap(c.sentences, resamples, seed, mean_out, ci_out);
  return 0;
}

// Edit distance between two pre-tokenized id sequences (library use).
int64_t tasas_edit_distance(const int* ref, int ref_len, const int* hyp,
                            int hyp_len) {
  std::vector<int> r(ref, ref + ref_len), h(hyp, hyp + hyp_len);
  return edit_distance(r, h);
}

}  // extern "C"

#ifndef TASAS_NO_MAIN
int main(int argc, char** argv) {
  std::string field_sep = "#";
  std::string symbol_sep;
  const char* path = nullptr;
  bool do_bootstrap = false;
  int resamples = 1000;
  uint64_t seed = 0;
  bool seeded = false;
  for (int i = 1; i < argc; ++i) {
    if (!std::strcmp(argv[i], "-f") && i + 1 < argc) {
      field_sep = argv[++i];
    } else if (!std::strcmp(argv[i], "-s") && i + 1 < argc) {
      symbol_sep = argv[++i];
    } else if (!std::strcmp(argv[i], "--bootstrap")) {
      do_bootstrap = true;
    } else if (!std::strcmp(argv[i], "-n") && i + 1 < argc) {
      resamples = std::atoi(argv[++i]);
    } else if (!std::strcmp(argv[i], "--seed") && i + 1 < argc) {
      seed = std::strtoull(argv[++i], nullptr, 10);
      seeded = true;
    } else {
      path = argv[i];
    }
  }
  // Invoked through the tasasIntervalo symlink -> bootstrap mode, like the
  // reference's second binary.
  const char* base = std::strrchr(argv[0], '/');
  base = base ? base + 1 : argv[0];
  if (!std::strcmp(base, "tasasIntervalo")) do_bootstrap = true;
  if (!path) {
    std::fprintf(stderr,
                 "usage: %s [-f FIELD_SEP] [-s SYMBOL_SEP] [--bootstrap] "
                 "[-n RESAMPLES] [--seed SEED] FILE\n",
                 argv[0]);
    return 2;
  }
  if (do_bootstrap) {
    if (!seeded) seed = std::random_device{}();
    double mean, ci;
    tasas_bootstrap(path, field_sep.c_str(), symbol_sep.c_str(), resamples,
                    seed, &mean, &ci);
    std::printf("%.2f +- %.2f\n", mean, ci);
  } else {
    std::printf("%.2f\n",
                tasas_error_rate(path, field_sep.c_str(), symbol_sep.c_str()));
  }
  return 0;
}
#endif
