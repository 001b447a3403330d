// Tests mirror kjarni-ffi/bindings/csharp/Kjarni.Tests: require libkjarni.so
// (build with `make -C native`) on LD_LIBRARY_PATH and a populated model
// cache; model-dependent tests are gated on KJARNI_TEST_MODELS=1 and cover
// every task handle plus streaming and cancellation (the same surface
// tests/test_binding_contract.py pins structurally in-image).
//
//   LD_LIBRARY_PATH=$REPO/native KJARNI_TEST_MODELS=1 \
//   dotnet test bindings/csharp/Kjarni.Tests
//
// Transcriber additionally needs KJARNI_TEST_AUDIO=<path-to-wav>.

using System;
using System.IO;
using System.Linq;
using Xunit;

namespace Kjarni.Tests
{
    public class LibraryTests
    {
        [Fact]
        public void VersionIsNonEmpty()
        {
            Assert.False(string.IsNullOrEmpty(KjarniLib.Version));
        }

        [Fact]
        public void UnknownTaskThrowsWithMessage()
        {
            var ex = Assert.Throws<KjarniException>(
                () => new Classifier("::no-such-model::").Classify("x"));
            Assert.False(string.IsNullOrEmpty(ex.Message));
        }
    }

    public class CancelTokenTests
    {
        [Fact]
        public void CancelSticks()
        {
            using var tok = new CancelToken();
            Assert.False(tok.IsCancelled);
            tok.Cancel();
            Assert.True(tok.IsCancelled);
        }

        [Fact]
        public void DoubleDisposeIsSafe()
        {
            var tok = new CancelToken();
            tok.Dispose();
            tok.Dispose();
        }
    }

    public class ModelTests
    {
        private static bool HasModels =>
            Environment.GetEnvironmentVariable("KJARNI_TEST_MODELS") == "1";

        private static string? AudioPath =>
            Environment.GetEnvironmentVariable("KJARNI_TEST_AUDIO");

        [Fact]
        public void ClassifierClassifies()
        {
            if (!HasModels) return;  // no model cache: pass vacuously
            using var clf = new Classifier();
            var r = clf.Classify("I love this product!");
            Assert.False(string.IsNullOrEmpty(r.Label));
            Assert.InRange(r.Score, 0.0, 1.0);
            Assert.NotEmpty(r.AllScores);
            Assert.Equal(2, clf.ClassifyBatch(new[] { "great", "awful" }).Count);
            Assert.Contains(r.Label, clf.Labels());
        }

        [Fact]
        public void EmbedderEmbedsAndRanks()
        {
            if (!HasModels) return;
            using var emb = new Embedder();
            var v = emb.Encode("hello world");
            Assert.NotEmpty(v);
            Assert.Equal(emb.Dim, v.Length);
            Assert.True(emb.Similarity("doctor", "physician") > 0.5);
            Assert.True(emb.Similarity("doctor", "physician") >
                        emb.Similarity("doctor", "asphalt"));
            Assert.Equal(2, emb.EncodeBatch(new[] { "a", "b" }).Count);
        }

        [Fact]
        public void RerankerOrdersByRelevance()
        {
            if (!HasModels) return;
            using var rr = new Reranker();
            var docs = new[] { "a recipe for pancakes",
                               "how to treat a fever",
                               "bus timetable for route 9" };
            var ranked = rr.Rerank("medical advice for flu symptoms", docs);
            Assert.Equal(docs.Length, ranked.Count);
            Assert.Equal(1, ranked[0].Index);
            Assert.True(ranked[0].Score >= ranked[1].Score);
            Assert.Single(rr.RerankTopK("medical advice", docs, 1));
            // Score is the raw pair head, any float
            _ = rr.Score("query", "document");
        }

        [Fact]
        public void ChatSendsAndStreams()
        {
            if (!HasModels) return;
            using var chat = new Chat();
            var reply = chat.Send("Say the word hello.");
            Assert.False(string.IsNullOrEmpty(reply));
            chat.ClearHistory();
            var pieces = chat.Stream("Count to three.").Take(8).ToList();
            Assert.NotEmpty(pieces);
        }

        [Fact]
        public void GeneratorGeneratesAndStreams()
        {
            if (!HasModels) return;
            using var gen = new Generator();
            var text = gen.Generate("Once upon a time", maxNewTokens: 8);
            Assert.False(string.IsNullOrEmpty(text));
            var pieces = gen.GenerateStream("Once upon a time").Take(4).ToList();
            Assert.NotEmpty(pieces);
        }

        [Fact]
        public void GeneratorStreamsWithCancel()
        {
            if (!HasModels) return;
            using var gen = new Generator();
            using var tok = new CancelToken();
            int n = 0;
            foreach (var piece in gen.GenerateStream("Once upon a time", tok))
            {
                if (++n >= 3) { tok.Cancel(); break; }
            }
            Assert.InRange(n, 1, 3);
            Assert.True(tok.IsCancelled);
        }

        [Fact]
        public void ChatStreamHonorsCancel()
        {
            if (!HasModels) return;
            using var chat = new Chat();
            using var tok = new CancelToken();
            int n = 0;
            foreach (var piece in chat.Stream("Tell me a long story.", tok))
            {
                if (++n >= 2) { tok.Cancel(); break; }
            }
            Assert.InRange(n, 1, 2);
        }

        [Fact]
        public void SummarizerSummarizes()
        {
            if (!HasModels) return;
            using var s = new Summarizer();
            var article = string.Join(" ", Enumerable.Repeat(
                "The committee met on Tuesday to discuss the budget.", 20));
            var summary = s.Summarize(article);
            Assert.False(string.IsNullOrEmpty(summary));
            Assert.True(summary.Length < article.Length);
        }

        [Fact]
        public void TranslatorTranslates()
        {
            if (!HasModels) return;
            using var t = new Translator();
            var de = t.Translate("Hello, how are you?", "en", "de");
            Assert.False(string.IsNullOrEmpty(de));
        }

        [Fact]
        public void TranscriberTranscribesFile()
        {
            if (!HasModels || string.IsNullOrEmpty(AudioPath)) return;
            using var t = new Transcriber();
            var transcript = t.TranscribeFile(AudioPath!);
            Assert.True(transcript.Duration > 0);
            Assert.NotNull(transcript.Text);
            Assert.NotNull(transcript.Segments);
        }

        [Fact]
        public void IndexThenSearchRoundtrip()
        {
            if (!HasModels) return;
            var dir = Path.Combine(Path.GetTempPath(),
                                   "kjarni-cs-test-" + Guid.NewGuid());
            Directory.CreateDirectory(dir);
            try
            {
                var doc = Path.Combine(dir, "doc.txt");
                File.WriteAllText(doc,
                    "The quick brown fox jumps over the lazy dog.\n" +
                    "Medical staff treat patients in the hospital.\n");
                var index = Path.Combine(dir, "idx");
                using (var ix = new Indexer(quiet: true))
                {
                    ix.Create(index, new[] { doc });
                    ix.Add(index, new[] { doc });   // idempotent re-add
                }
                using var se = new Searcher();
                var hits = se.Search(index, "who treats patients?", topK: 3);
                Assert.NotEmpty(hits);
                Assert.True(hits[0].Score >= hits[^1].Score);
            }
            finally
            {
                Directory.Delete(dir, recursive: true);
            }
        }
    }
}
